"""Pallas kernel for the fork's Conv2D+Maxpool pair: fused implicit-GEMM.

The fork's CUDA kernels (Conv2DComponent patch-gather + per-filter GEMM
+ 3-D MaxpoolingComponent, ref BASELINE.json / upstream nnet2
Convolutional1dComponent's CopyCols + AddMatMat) map onto TPU as ONE
Pallas kernel that assembles the im2col patch matrix INSIDE VMEM,
runs the conv GEMM on the MXU, and max-pools before anything leaves
VMEM.  Earlier generations that materialized the patch matrix in HBM
(a standalone im2col GEMM and a slab-layout fused variant) measured
slower than XLA's own conv at the flagship shape — 5.8 ms vs 3.5 ms
at mb 4096, with >4x byte amplification from every input element
belonging to ~28 patches — and were removed in round 5; the XLA conv
is the fallback path (`Conv2DComponent.forward`), this kernel the
`use_pallas` production path for inference (measured 2.40 ms vs
3.03 ms for the XLA conv+pool chain, BENCH_r04).

Toolchain note (verified on the axon v5e stack, 2026-08): Mosaic here
compiles only 2-D refs/ops — any >=3-D reshape, strided row slice, or
in-kernel gather aborts remote compilation (HTTP 500).  The kernel is
therefore written entirely with 2-D blocks; the input row layout
(t*in_f + f)*in_c + c makes the (df, c) window of every output
position a CONTIGUOUS filt_f*in_c column slice per filter tap dt, so
the patch matrix for one output row is assembled from filt_t static
2-D slice copies — no gather, no HBM round-trip.  Pooling collapses
the conv output before it ever leaves VMEM: HBM traffic is read-x +
write-pooled ≈ 62 MB at the flagship shape vs ~1.5 GB for the
unfused chain.  (ref: the fork's fused CUDA conv/maxpool kernels,
BASELINE.json "speed-of-light on the conv/maxpool" goal.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_cnn_tpu.ops.common import round_up, use_interpret


def _implicit_kernel(x_ref, w_ref, b_ref, out_ref, rows_ref, *,
                     in_f, in_c, filt_t, filt_f, out_t, out_f, nf,
                     pool_t, pool_f, relu, blk, bf16):
    fc = filt_f * in_c
    opf = out_f // pool_f
    for ot in range(out_t):
        # build the patch rows for this output row in VMEM:
        # rows[of*blk + n, (dt*filt_f + df)*in_c + c]
        for of in range(out_f):
            for dt in range(filt_t):
                start = ((ot + dt) * in_f + of) * in_c
                rows_ref[of * blk:(of + 1) * blk,
                         dt * fc:(dt + 1) * fc] = \
                    x_ref[:, start:start + fc]
        rows = rows_ref[:]
        w = w_ref[:]
        if bf16:
            rows = rows.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        y = jnp.dot(rows, w, preferred_element_type=jnp.float32) \
            + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        # pool: max over pool_f row-blocks of y, then across the
        # pool_t conv rows accumulated straight into the output block
        otp = ot // pool_t
        first = (ot % pool_t) == 0
        for ofp in range(opf):
            m = y[(ofp * pool_f) * blk:(ofp * pool_f + 1) * blk, :]
            for j in range(1, pool_f):
                m = jnp.maximum(
                    m, y[(ofp * pool_f + j) * blk:
                         (ofp * pool_f + j + 1) * blk, :])
            sl = slice((otp * opf + ofp) * nf, (otp * opf + ofp + 1) * nf)
            if first:
                out_ref[:, sl] = m
            else:
                out_ref[:, sl] = jnp.maximum(out_ref[:, sl], m)


def conv2d_maxpool_implicit(x: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray, conv, pool_t: int = 1,
                            pool_f: int = 1, relu: bool = False,
                            block: int = 128,
                            bf16: bool = True) -> jnp.ndarray:
    """Fused conv+bias(+relu)+maxpool with in-VMEM implicit im2col.

    Returns [N, (out_t//pool_t) * (out_f//pool_f) * num_filters] in
    (ot', of', filter) order — Maxpooling3DComponent(pool_c=1) applied
    to Conv2DComponent output (golden test vs the unfused component
    chain in tests/test_conv_pallas.py; bench.py re-asserts equality
    compiled at the flagship shape before timing).  Requires stride 1
    (the recipes' configuration)."""
    assert conv.stride_t == 1 and conv.stride_f == 1
    assert conv.out_t % pool_t == 0 and conv.out_f % pool_f == 0
    n = x.shape[0]
    npad = round_up(max(n, 8), block)
    if npad != n:
        x = jnp.pad(x, ((0, npad - n), (0, 0)))
    f = conv.num_filters
    pooled_dim = (conv.out_t // pool_t) * (conv.out_f // pool_f) * f
    kernel = functools.partial(
        _implicit_kernel, in_f=conv.in_f, in_c=conv.in_c,
        filt_t=conv.filt_t, filt_f=conv.filt_f, out_t=conv.out_t,
        out_f=conv.out_f, nf=f, pool_t=pool_t, pool_f=pool_f,
        relu=relu, blk=block, bf16=bf16)
    out = pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((block, conv.input_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((conv.patch_dim, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, pooled_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, pooled_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((conv.out_f * block, conv.patch_dim),
                       jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * conv.num_patches * conv.patch_dim * f,
            bytes_accessed=4 * (npad * conv.input_dim
                                + conv.patch_dim * f
                                + npad * pooled_dim),
            transcendentals=0),
        interpret=use_interpret(),
    )(x, w.T, b.reshape(1, -1))
    return out[:n]
