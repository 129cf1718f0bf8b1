"""Data-parallel training step over a jax.sharding.Mesh.

The TPU-native successor of the reference's data parallelism
(ref: steps/nnet2/train_*.sh N parallel jobs + nnet2bin/nnet-am-average
per iteration; theory in Povey et al. ICLR WS 2015):

  mode A (default): ONE jitted train step over the global minibatch,
  batch sharded on the ``data`` mesh axis, params/opt replicated.  The
  NG-SGD delta contractions (deriv_hatᵀ @ in_hat) contract over the
  sharded row dimension, so GSPMD inserts psum over ICI automatically —
  per-step gradient exchange without writing a single collective.

  mode B (reference semantics): independent per-device updates with
  periodic ``average_params`` (= nnet-am-average) — for cross-slice DCN
  sync or for bitwise-reproducing the reference's training dynamics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kaldi_cnn_tpu.models.nnet import Nnet


def make_dp_step(net: Nnet, mesh: Mesh) -> Callable:
    """Returns step(params, opt, x, labels, lr, key=None, weights=None)
    with x/labels/weights sharded over the 'data' axis."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    jitted = jax.jit(
        net._train_step_impl,
        in_shardings=(repl, repl, shard, shard, shard, repl, repl),
        out_shardings=(repl, repl, repl),
    )

    def step(params, opt, x, labels, lr, key=None, weights=None):
        n = x.shape[0]
        if weights is None:
            weights = jnp.ones((n,), jnp.float32)
        if key is None:
            key = np.zeros(2, np.uint32)
        return jitted(params, opt, jnp.asarray(x), jnp.asarray(labels),
                      jnp.asarray(weights),
                      jnp.asarray(lr, jnp.float32), jnp.asarray(key))

    return step


def average_params(param_list):
    """nnet-am-average equivalent: elementwise mean over model copies
    (ref: src/nnet2bin/nnet-am-average.cc)."""
    n = len(param_list)
    return jax.tree_util.tree_map(
        lambda *leaves: sum(leaves) / n, *param_list)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host process-group init (ref replacement for queue.pl job
    launching; SURVEY.md §2.3).  No-op when single-process."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
