"""iVector layer tests (ref pattern: ivector/ivector-extractor-test.cc
randomized EM objective checks + plda-test.cc)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.ivector import (
    IvectorExtractor, Plda, VadOptions, compute_vad, estimate_plda,
    length_normalize, train_ubm)


def _speaker_data(rng, n_spk=6, utts_per_spk=4, frames=120, dim=8,
                  shift_scale=2.0):
    """Utterances whose mean shifts per speaker along a hidden
    subspace — exactly the total-variability model."""
    subspace = rng.normal(size=(2, dim))
    base = rng.normal(size=dim)
    out, spk_of = [], []
    for s in range(n_spk):
        w = rng.normal(size=2) * shift_scale
        shift = w @ subspace
        for _ in range(utts_per_spk):
            x = base + shift + rng.normal(size=(frames, dim))
            out.append(x.astype(np.float32))
            spk_of.append(f"spk{s}")
    return out, spk_of


def test_ubm_training(rng):
    feats, _ = _speaker_data(rng)
    ubm = train_ubm(feats, 4, num_iters=4)
    assert ubm.num_gauss == 4
    x = np.concatenate(feats)
    ll = ubm.loglikes(x).mean()
    single = train_ubm(feats, 1, num_iters=2)
    assert ll >= single.loglikes(x).mean() - 1e-6


def test_ivector_separates_speakers(rng):
    feats, spk_of = _speaker_data(rng)
    ubm = train_ubm(feats, 4, num_iters=4)
    ext = IvectorExtractor(ubm, ivector_dim=4, seed=0)
    ext.train(feats, num_iters=4)
    ivs = [length_normalize(ext.extract(f)) for f in feats]
    # within-speaker iVector distance < between-speaker distance
    within, between = [], []
    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            d = np.linalg.norm(ivs[i] - ivs[j])
            (within if spk_of[i] == spk_of[j] else between).append(d)
    assert np.mean(within) < np.mean(between)


def test_plda_scoring(rng):
    feats, spk_of = _speaker_data(rng, n_spk=8, utts_per_spk=5)
    ubm = train_ubm(feats, 4, num_iters=3)
    ext = IvectorExtractor(ubm, ivector_dim=4, seed=0)
    ext.train(feats, num_iters=3)
    by_spk = {}
    for f, s in zip(feats, spk_of):
        by_spk.setdefault(s, []).append(length_normalize(ext.extract(f)))
    plda = estimate_plda(by_spk, num_iters=5)
    # same-speaker trials must outscore different-speaker trials
    same, diff = [], []
    spks = sorted(by_spk)
    for s in spks:
        same.append(plda.llr(by_spk[s][0], by_spk[s][1]))
    for a, b in zip(spks, spks[1:]):
        diff.append(plda.llr(by_spk[a][0], by_spk[b][0]))
    assert np.mean(same) > np.mean(diff)


def test_vad(rng):
    e = np.concatenate([np.full(50, 0.0), np.full(50, 10.0)])
    v = compute_vad(e, VadOptions(vad_energy_threshold=2.0,
                                  vad_energy_mean_scale=0.5))
    assert v[:50].sum() == 0
    assert v[50:].sum() == 50
    # smoothing vote
    e2 = e.copy()
    e2[75] = 0.0
    v2 = compute_vad(e2, VadOptions(vad_energy_threshold=2.0,
                                    vad_energy_mean_scale=0.5,
                                    vad_frames_context=3,
                                    vad_proportion_threshold=0.5))
    assert v2[75] == 1.0  # outvoted by neighbors
