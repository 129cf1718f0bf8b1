"""Fused Pallas fbank/MFCC kernel.

TPU-native rebirth of the reference's feature pipeline
(ref: src/feat/feature-fbank.cc Fbank::Compute ->
src/feat/feature-window.cc ExtractWindow -> src/matrix/srfft.cc
SplitRadixRealFft -> src/feat/mel-computations.cc MelBanks::Compute),
which upstream runs frame-at-a-time on the CPU.  Here the whole chain

    DC-offset removal -> preemphasis -> window -> real-DFT -> |.|^2
    -> mel filterbank -> log  (-> DCT for MFCC)

runs in ONE Pallas kernel over a block of frames:

  * the real DFT is two MXU matmuls against precomputed cos/sin
    matrices (padded to lane multiples) — for the 512-point windows used
    in speech this beats an FFT butterfly on the MXU and fuses with the
    mel matmul;
  * the windowing chain is VPU elementwise work on the same VMEM block,
    so the power spectrum never round-trips to HBM;
  * frames stream through a 1-D grid over the time axis.

Numerical contract: matches kaldi_cnn_tpu.features.functional.compute_fbank
(rfft path) to ~1e-3 relative; golden tests in tests/test_fbank_pallas.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_cnn_tpu.features import functional as F
from kaldi_cnn_tpu.ops.common import cdiv, round_up, use_interpret

FRAME_BLOCK = 256  # frames per grid step (2.56 s of audio at 10 ms shift)


def _plan(opts: F.FbankOptions):
    """Precompute the constant operands for the fused kernel."""
    fo = opts.frame_opts
    n = fo.padded_window_size                     # e.g. 512
    nbins_fft = n // 2 + 1                        # e.g. 257
    fpad = round_up(nbins_fft, 128)               # e.g. 384
    cos, sin = F.dft_matrices(n, pad_bins_to=fpad)
    mel = F.mel_banks(opts.mel_opts, fo)          # [M, nbins_fft]
    mpad = round_up(opts.mel_opts.num_bins, 128)  # e.g. 128
    mel_t = np.zeros((fpad, mpad), np.float32)
    mel_t[:nbins_fft, : opts.mel_opts.num_bins] = mel.T
    window = np.zeros((1, n), np.float32)
    window[0, : fo.window_size] = F.feature_window(fo)
    # mask of valid (un-padded) samples, for the DC-offset mean
    mask = np.zeros((1, n), np.float32)
    mask[0, : fo.window_size] = 1.0
    return cos, sin, mel_t, window, mask, fpad, mpad


def _fbank_kernel(frames_ref, cos_ref, sin_ref, mel_ref, win_ref, mask_ref,
                  out_ref, energy_ref, *, ws: int, preemph: float,
                  remove_dc: bool, num_bins: int):
    x = frames_ref[:].astype(jnp.float32)                     # [B, N]
    mask = mask_ref[:]                                        # [1, N]
    if remove_dc:
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / float(ws)
        x = (x - mean) * mask
    # raw log energy (pre-preemphasis, pre-window) — Kaldi raw_energy=True
    energy_ref[:] = jnp.log(
        jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), F.EPSILON))
    if preemph != 0.0:
        prev = pltpu.roll(x, shift=1, axis=1)
        # sample 0 uses itself as predecessor (feature-window.cc)
        col0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0
        prev = jnp.where(col0, x, prev)
        x = (x - preemph * prev) * mask
    x = x * win_ref[:]
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                                  # [B, Fpad]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    # padded mel columns are zero -> log floor keeps them finite
    out_ref[:] = jnp.log(jnp.maximum(mel, F.EPSILON))


@functools.partial(jax.jit, static_argnames=("opts_key",))
def _fbank_call(frames, cos, sin, mel_t, window, mask, opts_key):
    (ws, preemph, remove_dc, num_bins) = opts_key
    T, n = frames.shape
    fpad, mpad = cos.shape[1], mel_t.shape[1]
    Tpad = round_up(max(T, 8), FRAME_BLOCK)
    if Tpad != T:
        frames = jnp.pad(frames, ((0, Tpad - T), (0, 0)))
    grid = (Tpad // FRAME_BLOCK,)
    kernel = functools.partial(
        _fbank_kernel, ws=ws, preemph=preemph,
        remove_dc=remove_dc, num_bins=num_bins)
    flops_per_frame = 2 * n * fpad * 2 + 2 * fpad * mpad
    out, energy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, fpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, fpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fpad, mpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((FRAME_BLOCK, mpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tpad, mpad), jnp.float32),
            jax.ShapeDtypeStruct((Tpad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=Tpad * flops_per_frame,
            bytes_accessed=4 * (Tpad * n + 2 * n * fpad + fpad * mpad
                                + Tpad * mpad),
            transcendentals=Tpad * mpad,
        ),
        interpret=use_interpret(),
    )(frames, cos, sin, mel_t, window, mask)
    return out[:T], energy[:T, 0]


def fbank_pallas(
    wave: jnp.ndarray,
    opts: Optional[F.FbankOptions] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """wave [N] -> log-mel fbank [T, num_bins(+1)] via the fused kernel.

    Dither (the only stochastic step) is applied on the raw frames
    outside the kernel so the Pallas and jnp paths see identical input.
    """
    opts = opts or F.FbankOptions()
    fo = opts.frame_opts
    frames = F.extract_frames(wave, fo).astype(jnp.float32)
    if fo.dither != 0.0 and key is not None:
        frames = frames + fo.dither * jax.random.normal(key, frames.shape)
    pad = fo.padded_window_size - fo.window_size
    if pad:
        frames = jnp.pad(frames, ((0, 0), (0, pad)))
    cos, sin, mel_t, window, mask, fpad, mpad = _plan(opts)
    opts_key = (fo.window_size, fo.preemph_coeff, fo.remove_dc_offset,
                opts.mel_opts.num_bins)
    out, energy = _fbank_call(
        frames, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(mel_t),
        jnp.asarray(window), jnp.asarray(mask), opts_key)
    feats = out[:, : opts.mel_opts.num_bins]
    if opts.use_energy:
        if opts.energy_floor > 0:
            energy = jnp.maximum(energy, math.log(opts.energy_floor))
        feats = jnp.concatenate([energy[:, None], feats], axis=1)
    return feats


def mfcc_pallas(
    wave: jnp.ndarray,
    opts: Optional[F.MfccOptions] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """MFCC on top of the fused log-mel kernel (DCT+lifter fuse in XLA)."""
    opts = opts or F.MfccOptions()
    fb = F.FbankOptions(frame_opts=opts.frame_opts, mel_opts=opts.mel_opts,
                        use_energy=True, raw_energy=opts.raw_energy,
                        use_log_fbank=True)
    both = fbank_pallas(wave, fb, key)
    energy, log_mel = both[:, 0], both[:, 1:]
    dct = jnp.asarray(F.dct_matrix(opts.num_ceps, opts.mel_opts.num_bins))
    feats = log_mel @ dct.T
    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(
            F.lifter_coeffs(opts.num_ceps, opts.cepstral_lifter))
    if opts.use_energy:
        if opts.energy_floor > 0:
            energy = jnp.maximum(energy, math.log(opts.energy_floor))
        feats = feats.at[:, 0].set(energy)
    return feats
