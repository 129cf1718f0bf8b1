"""Pallas kernel for the fork's Conv2D: im2col GEMM + bias (+fused
3-D maxpool variant).

The fork's CUDA kernels (Conv2DComponent patch-gather + per-filter GEMM,
ref BASELINE.json / upstream nnet2 Convolutional1dComponent's
CopyCols + AddMatMat) map onto TPU as: XLA gathers the time-freq
patches (lane gathers inside Mosaic kernels crash this toolchain's
remote compiler — measured, see note), then ONE Pallas GEMM kernel
computes conv + bias (+ ReLU + pool when fused) for all patches of the
minibatch on the MXU.

Toolchain note (verified on the axon v5e stack, 2026-08): Mosaic here
compiles only 2-D refs/ops — any >=3-D reshape, strided row slice, or
in-kernel gather aborts remote compilation (HTTP 500).  The kernels are
therefore written entirely with 2-D blocks; pooling uses a
pool-group-major ("slab") row layout so the 3-D max becomes a max over
G contiguous row slabs.  At fork-recipe shapes XLA's fused
gather+einsum chain is measured slightly faster (0.43 ms vs 0.69 ms at
B=512), so components default to the XLA path; these kernels are the
`use_pallas=True` backend and the base for future bf16/persistent
variants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_cnn_tpu.ops.common import round_up, use_interpret

ROW_BLOCK = 1024


def _gemm_bias_kernel(p_ref, w_ref, b_ref, out_ref):
    out_ref[:] = (jnp.dot(p_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32) + b_ref[:])


@functools.partial(jax.jit, static_argnames=("row_block",))
def _gemm_bias(rows: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               row_block: int = ROW_BLOCK) -> jnp.ndarray:
    """rows [R, K] @ w [K, F] + b, Pallas-tiled over row blocks."""
    r, k = rows.shape
    f = w.shape[1]
    rpad = round_up(max(r, 8), row_block)
    if rpad != r:
        rows = jnp.pad(rows, ((0, rpad - r), (0, 0)))
    out = pl.pallas_call(
        _gemm_bias_kernel,
        grid=(rpad // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rpad * k * f,
            bytes_accessed=4 * (rpad * k + k * f + rpad * f),
            transcendentals=0),
        interpret=use_interpret(),
    )(rows, w, b.reshape(1, -1))
    return out[:r]


def conv2d_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  comp) -> jnp.ndarray:
    """x [N, input_dim] -> [N, num_patches, num_filters].

    Matches Conv2DComponent.forward's einsum path bit-for-bit in MXU
    precision (golden test in tests/test_conv_pallas.py).
    """
    n = x.shape[0]
    patches = comp.extract_patches(x)           # [N, P, K] (XLA gather)
    rows = patches.reshape(n * comp.num_patches, comp.patch_dim)
    y = _gemm_bias(rows, w.T, b)
    return y.reshape(n, comp.num_patches, comp.num_filters)


# --------------------------------------------------------------------------
# fused conv + bias + ReLU + 3-D maxpool (slab layout)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _slab_indices(in_t, in_f, in_c, filt_t, filt_f, stride_t, stride_f,
                  pool_t, pool_f) -> np.ndarray:
    """Patch gather indices ordered pool-group-major:
    [G * S, K] where G = pool_t*pool_f slabs of S pooled positions."""
    from kaldi_cnn_tpu.models.components import _conv_patch_indices
    out_t = (in_t - filt_t) // stride_t + 1
    out_f = (in_f - filt_f) // stride_f + 1
    idx = _conv_patch_indices(in_t, in_f, in_c, filt_t, filt_f,
                              stride_t, stride_f)
    idx = idx.reshape(out_t, out_f, -1)
    slabs = []
    for it in range(pool_t):
        for jf in range(pool_f):
            for ot in range(out_t // pool_t):
                for of in range(out_f // pool_f):
                    slabs.append(idx[ot * pool_t + it, of * pool_f + jf])
    return np.stack(slabs)                       # [G*S, K]


# --------------------------------------------------------------------------
# implicit-GEMM fused conv + bias (+ReLU) + 3-D maxpool
# --------------------------------------------------------------------------
#
# The round-2 fused kernel lost to XLA 1.9x because it read an
# XLA-materialized im2col patch matrix from HBM (4.6x byte
# amplification: every input element belongs to ~28 patches).  This
# kernel performs the im2col INSIDE VMEM: the input row layout
# (t*in_f + f)*in_c + c makes the (df, c) window of every output
# position a CONTIGUOUS 21-column slice per filter tap dt, so the patch
# matrix for one output row is assembled from filt_t static 2-D slice
# copies — no gather, no >=2-D ops, no HBM round-trip (the Mosaic
# constraints documented above).  Pooling then collapses the conv
# output 6x before it ever leaves VMEM.  HBM traffic drops from
# ~6.7 GB (round-2 kernel) to read-x + write-pooled ≈ 62 MB at the
# flagship shape.  (ref: the fork's fused CUDA conv/maxpool kernels,
# BASELINE.json "speed-of-light on the conv/maxpool" goal.)

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
    to Conv2DComponent output (identical to conv2d_maxpool_fused, which
    it replaces as the performance path; golden tests compare all
    three).  Requires stride 1 (the recipes' configuration)."""
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


def _fused_kernel(p_ref, w_ref, b_ref, out_ref, *, g: int, s: int,
                  relu: bool):
    y = jnp.dot(p_ref[:], w_ref[:], preferred_element_type=jnp.float32) \
        + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    acc = y[0:s, :]
    for gg in range(1, g):
        acc = jnp.maximum(acc, y[gg * s:(gg + 1) * s, :])
    out_ref[:] = acc


def conv2d_maxpool_fused(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                         conv, pool_t: int, pool_f: int,
                         relu: bool = False) -> jnp.ndarray:
    """Fused conv+bias(+relu)+maxpool over (time, freq).

    Returns [N, (out_t//pool_t) * (out_f//pool_f) * num_filters] in
    (ot', of', filter) order — exactly Maxpooling3DComponent(pool_c=1)
    applied to Conv2DComponent output.
    """
    n = x.shape[0]
    g = pool_t * pool_f
    s = (conv.out_t // pool_t) * (conv.out_f // pool_f)
    # Mosaic requires sublane-block divisibility by 8: pad each slab
    # with dummy pooled positions, sliced off after the kernel
    s_pad = round_up(s, 8)
    idx = _slab_indices(
        conv.in_t, conv.in_f, conv.in_c, conv.filt_t, conv.filt_f,
        conv.stride_t, conv.stride_f, pool_t, pool_f)
    idx = idx.reshape(g, s, conv.patch_dim)
    idx = np.pad(idx, ((0, 0), (0, s_pad - s), (0, 0)))
    patches = x[:, jnp.asarray(idx.reshape(g * s_pad, conv.patch_dim))]
    # per-example slab blocks: [N, G, S', K] -> [N*G*S', K], g outermost
    # inside each example block
    rows = patches.reshape(n * g * s_pad, conv.patch_dim)
    f = conv.num_filters
    kernel = functools.partial(_fused_kernel, g=g, s=s_pad, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((g * s_pad, conv.patch_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((conv.patch_dim, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_pad, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * s_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * s_pad * conv.patch_dim * f,
            bytes_accessed=4 * (n * g * s_pad * conv.patch_dim
                                + conv.patch_dim * f + n * s_pad * f),
            transcendentals=0),
        interpret=use_interpret(),
    )(rows, w.T, b.reshape(1, -1))
    out = out.reshape(n, s_pad, f)[:, :s, :]
    return out.reshape(n, s * f)
