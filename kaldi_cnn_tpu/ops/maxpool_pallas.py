"""Pallas kernel for the fork's 3-D max pooling.

The pool groups are gathered into pool-offset-major row slabs by XLA
(lane gathers don't compile inside Mosaic on this toolchain — see
conv_pallas.py note), then one 2-D Pallas kernel takes the running max
over the G contiguous slabs.  Semantics match
Maxpooling3DComponent.forward (reshape+max reference); golden test in
tests/test_conv_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_cnn_tpu.ops.common import round_up, use_interpret


@functools.lru_cache(maxsize=None)
def _pool_indices(in_t, in_f, in_c, pool_t, pool_f, pool_c) -> np.ndarray:
    """[G, out_dim] gather indices: entry [g, o] is the flat input index
    of pool-offset g of output element o (o in (ot, of, oc) order)."""
    out_t, out_f, out_c = in_t // pool_t, in_f // pool_f, in_c // pool_c
    ot = np.arange(out_t)[:, None, None]
    of = np.arange(out_f)[None, :, None]
    oc = np.arange(out_c)[None, None, :]
    groups = []
    for it in range(pool_t):
        for jf in range(pool_f):
            for kc in range(pool_c):
                t = ot * pool_t + it
                f = of * pool_f + jf
                c = oc * pool_c + kc
                groups.append(((t * in_f + f) * in_c + c).reshape(-1))
    return np.stack(groups).astype(np.int32)      # [G, out_dim]


def _maxpool_kernel(x_ref, out_ref, *, g: int, n: int):
    acc = x_ref[0:n, :]
    for gg in range(1, g):
        acc = jnp.maximum(acc, x_ref[gg * n:(gg + 1) * n, :])
    out_ref[:] = acc


def maxpool3d_pallas(x: jnp.ndarray, comp) -> jnp.ndarray:
    """x [N, input_dim] -> [N, output_dim] (pool_t x pool_f x pool_c max)."""
    n = x.shape[0]
    idx = jnp.asarray(_pool_indices(
        comp.in_t, comp.in_f, comp.in_c,
        comp.pool_t, comp.pool_f, comp.pool_c))
    g, out_dim = idx.shape
    cols = x[:, idx]                              # [N, G, out_dim] (XLA)
    rows = cols.transpose(1, 0, 2).reshape(g * n, out_dim)
    out = pl.pallas_call(
        functools.partial(_maxpool_kernel, g=g, n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=use_interpret(),
    )(rows)
    return out
