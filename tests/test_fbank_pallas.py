"""Golden tests: fused Pallas fbank kernel vs the jnp reference pipeline
(the reference's cudamatrix GPU-vs-CPU oracle pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_cnn_tpu.features import functional as F
from kaldi_cnn_tpu.ops.fbank_pallas import fbank_pallas, mfcc_pallas


def _speechy_wave(rng, sr=16000, dur=1.0):
    """Noise + a few harmonics, speech-scale amplitude."""
    t = np.arange(int(sr * dur)) / sr
    x = 300 * np.sin(2 * np.pi * 220 * t) + 150 * np.sin(2 * np.pi * 680 * t)
    x += 80 * np.sin(2 * np.pi * 1900 * t) + rng.normal(0, 20, t.shape)
    return x.astype(np.float32)


@pytest.mark.parametrize("num_bins", [23, 40])
def test_fbank_pallas_matches_reference(rng, num_bins):
    opts = F.FbankOptions(mel_opts=F.MelBanksOptions(num_bins=num_bins))
    opts.frame_opts.dither = 0.0
    wave = jnp.asarray(_speechy_wave(rng))
    ref = np.asarray(F.compute_fbank(wave, opts))
    got = np.asarray(fbank_pallas(wave, opts))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=0.08)


def test_fbank_pallas_with_energy(rng):
    opts = F.FbankOptions(use_energy=True)
    opts.frame_opts.dither = 0.0
    wave = jnp.asarray(_speechy_wave(rng))
    ref = np.asarray(F.compute_fbank(wave, opts))
    got = np.asarray(fbank_pallas(wave, opts))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=0.08)


def test_fbank_pallas_dither_same_key(rng):
    opts = F.FbankOptions()
    wave = jnp.asarray(_speechy_wave(rng))
    key = jax.random.PRNGKey(7)
    ref = np.asarray(F.compute_fbank(wave, opts, key))
    got = np.asarray(fbank_pallas(wave, opts, key))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=0.08)


def test_fbank_pallas_nonmultiple_block(rng):
    """Frame counts that don't divide the kernel block size."""
    opts = F.FbankOptions()
    opts.frame_opts.dither = 0.0
    wave = jnp.asarray(_speechy_wave(rng, dur=0.317))
    ref = np.asarray(F.compute_fbank(wave, opts))
    got = np.asarray(fbank_pallas(wave, opts))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=0.08)


def test_mfcc_pallas_matches_reference(rng):
    opts = F.MfccOptions()
    opts.frame_opts.dither = 0.0
    wave = jnp.asarray(_speechy_wave(rng))
    ref = np.asarray(F.compute_mfcc(wave, opts))
    got = np.asarray(mfcc_pallas(wave, opts))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=0.15)
