"""PLP / pitch / resample / compression tests (ref patterns:
feat/feature-test.cc invariants, feat/resample-test.cc sine-wave
checks, matrix/compressed-matrix round-trip tolerances)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.features import functional as F
from kaldi_cnn_tpu.features.pitch import (
    PitchOptions, add_pitch_features, compute_pitch)
from kaldi_cnn_tpu.features.plp import PlpOptions, compute_plp
from kaldi_cnn_tpu.features.resample import resample_waveform
from kaldi_cnn_tpu.io.compressed import (
    compress_matrix, decompress_matrix, load_compressed_ark,
    save_compressed_ark)


def test_plp_shapes_and_stability(rng):
    wave = (rng.normal(size=8000) * 500).astype(np.float32)
    opts = PlpOptions()
    opts.frame_opts.samp_freq = 8000.0
    opts.frame_opts.dither = 0.0
    feats = compute_plp(wave, opts)
    T = F.num_frames(8000, opts.frame_opts)
    assert feats.shape == (T, 13)
    assert np.isfinite(feats).all()
    # deterministic
    feats2 = compute_plp(wave, opts)
    np.testing.assert_allclose(feats, feats2)


def test_plp_distinguishes_tones(rng):
    sr = 8000.0
    t = np.arange(8000) / sr
    a = (3000 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)
    b = (3000 * np.sin(2 * np.pi * 1600 * t)).astype(np.float32)
    opts = PlpOptions()
    opts.frame_opts.samp_freq = sr
    opts.frame_opts.dither = 0.0
    fa, fb = compute_plp(a, opts), compute_plp(b, opts)
    # different spectra -> clearly different cepstra
    assert np.abs(fa.mean(axis=0) - fb.mean(axis=0)).max() > 0.5


def test_pitch_tracks_sine(rng):
    sr = 8000.0
    t = np.arange(16000) / sr
    for f0 in (120.0, 220.0):
        wave = (3000 * np.sin(2 * np.pi * f0 * t)
                + rng.normal(size=len(t)) * 30).astype(np.float32)
        p = compute_pitch(wave, PitchOptions(samp_freq=sr))
        mid = p[5:-5]
        assert np.median(mid[:, 1]) == pytest.approx(f0, rel=0.05)
        assert np.median(mid[:, 0]) > 0.7     # strongly voiced
    # noise has low POV
    noise = (rng.normal(size=16000) * 1000).astype(np.float32)
    pn = compute_pitch(noise, PitchOptions(samp_freq=sr))
    assert np.median(pn[:, 0]) < np.float64(0.7)


def test_add_pitch_features(rng):
    feats = rng.normal(size=(50, 13)).astype(np.float32)
    pf = np.stack([np.full(50, 0.9), np.full(50, 200.0)], axis=1)
    out = add_pitch_features(feats, pf.astype(np.float32))
    assert out.shape == (50, 15)
    assert np.allclose(out[:, 13], 0.9)
    assert np.allclose(out[:, 14], 0.0, atol=1e-5)  # mean-normalized


def test_resample_sine_preserved(rng):
    sr_in, sr_out = 16000.0, 8000.0
    t = np.arange(16000) / sr_in
    f = 440.0
    wave = np.sin(2 * np.pi * f * t).astype(np.float32)
    out = resample_waveform(wave, sr_in, sr_out)
    assert len(out) == 8000
    t2 = np.arange(len(out)) / sr_out
    expect = np.sin(2 * np.pi * f * t2)
    # ignore edges (window support)
    sl = slice(100, -100)
    err = np.abs(out[sl] - expect[sl]).max()
    assert err < 0.02


def test_resample_identity():
    w = np.arange(100, dtype=np.float32)
    out = resample_waveform(w, 8000.0, 8000.0)
    np.testing.assert_allclose(out, w)


def test_compressed_matrix_roundtrip(rng):
    m = rng.normal(size=(200, 13)).astype(np.float32) * 10
    blob = compress_matrix(m)
    assert blob["codes"].dtype == np.uint8
    out = decompress_matrix(blob)
    # relative error small vs column dynamic range (Kaldi tolerance)
    rng_col = m.max(axis=0) - m.min(axis=0)
    err = np.abs(out - m).max(axis=0) / rng_col
    assert err.max() < 0.02


def test_compressed_ark_roundtrip(tmp_path, rng):
    mats = {f"u{i}": rng.normal(size=(30 + i, 8)).astype(np.float32)
            for i in range(3)}
    p = str(tmp_path / "feats.npz")
    save_compressed_ark(p, mats)
    back = load_compressed_ark(p)
    assert set(back) == set(mats)
    for u in mats:
        assert np.abs(back[u] - mats[u]).max() < 0.2
