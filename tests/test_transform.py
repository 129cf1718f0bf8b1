"""Transform-layer tests (ref pattern: src/transform/*-test.cc
randomized property tests: objective improvement + shape checks)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.gmm.diag_gmm import DiagGmm
from kaldi_cnn_tpu.gmm.am_gmm import AmDiagGmm
from kaldi_cnn_tpu.transform import (
    FmllrAccs, LdaEstimate, MlltAccs, apply_affine, compose_affine)


def test_lda_separates_classes(rng):
    d, n = 10, 500
    dir1 = rng.normal(size=d)
    dir1 /= np.linalg.norm(dir1)
    x0 = rng.normal(size=(n, d))
    x1 = rng.normal(size=(n, d)) + 6.0 * dir1
    lda = LdaEstimate(2, d)
    lda.accumulate(x0, np.zeros(n, int))
    lda.accumulate(x1, np.ones(n, int))
    T, objf = lda.estimate(2)
    assert T.shape == (2, d + 1)
    assert objf > 1.0
    y0, y1 = apply_affine(x0, T), apply_affine(x1, T)
    # projected means differ strongly in the kept dims
    sep = np.abs(y0.mean(axis=0) - y1.mean(axis=0)).max()
    assert sep > 3.0
    # within-class variance is whitened to ~1
    pooled = np.concatenate([y0 - y0.mean(axis=0), y1 - y1.mean(axis=0)])
    assert np.allclose(pooled.var(axis=0), 1.0, atol=0.3)


def test_compose_affine(rng):
    a = rng.normal(size=(3, 5))
    b = rng.normal(size=(2, 4))
    x = rng.normal(size=(7, 4))
    once = apply_affine(apply_affine(x, a), b)
    comp = apply_affine(x, compose_affine(b, a))
    assert np.allclose(once, comp, atol=1e-10)


def test_mllt_improves_auxf(rng):
    # correlated data modeled by a diagonal GMM: MLLT should find a
    # rotation improving the diagonal-covariance auxiliary
    d, n = 4, 2000
    A = np.eye(d) + 0.5 * rng.normal(size=(d, d))
    x = rng.normal(size=(n, d)) @ A.T
    mean = x.mean(axis=0)
    var = x.var(axis=0)
    acc = MlltAccs(d)
    acc.accumulate(x, mean[None, :], (1.0 / var)[None, :],
                   np.ones((n, 1)))
    M = acc.update()
    assert M.shape == (d, d)
    assert acc.objf(M) >= acc.objf(np.eye(d)) - 1e-6
    assert acc.objf(M) > acc.objf(np.eye(d)) + 0.05 * n  # real gain


def test_fmllr_recovers_mismatch(rng):
    # model trained on x; test data is A x + b: fMLLR should undo it
    d, n = 5, 1500
    means = rng.normal(size=(3, d)) * 3
    gmm = DiagGmm(np.ones(3) / 3, means, np.ones((3, d)))
    comp = rng.integers(0, 3, n)
    x = means[comp] + rng.normal(size=(n, d))
    A = np.eye(d) + 0.3 * rng.normal(size=(d, d))
    b = rng.normal(size=d)
    y = x @ A.T + b
    am = AmDiagGmm([gmm])
    acc = FmllrAccs(d)
    acc.accumulate_am(am, y, np.zeros(n, int))
    W = acc.update()
    assert W is not None
    ident = np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1)
    assert acc.auxf(W) > acc.auxf(ident) + 10.0
    z = y @ W[:, :-1].T + W[:, -1]
    ll_before = gmm.loglikes(y).mean()
    ll_after = gmm.loglikes(z).mean()
    assert ll_after > ll_before + 0.1


def test_fmllr_min_count():
    acc = FmllrAccs(4)
    assert acc.update(min_count=100.0) is None


@pytest.mark.slow
def test_lda_mllt_sat_pipeline():
    """Smoke: mono -> LDA+MLLT -> SAT on a tiny corpus; loglike must
    improve at each stage's end vs its start (ref: steps/train_*.sh
    progression logged in RESULTS)."""
    from kaldi_cnn_tpu.recipes import synthetic
    from kaldi_cnn_tpu.recipes.yesno import compute_features
    from kaldi_cnn_tpu.lang.hclg import Lang
    from kaldi_cnn_tpu.gmm.train import (
        LdaMlltTrainOptions, MonoTrainOptions, SatTrainOptions,
        train_lda_mllt, train_mono, train_sat)
    lex = synthetic.yesno_lexicon()
    corpus = synthetic.make_corpus(lex, {"yes": 0.5, "no": 0.5},
                                   16, 1, 2, 9)
    feats = compute_features(corpus, seed=9)
    lang = Lang.create(lex)
    am, ali = train_mono(feats, corpus.transcripts, lang,
                         MonoTrainOptions(num_iters=6, totgauss=60))
    # raw (no-delta) mfcc for the LDA stage
    raw = {u: f[:, :13] for u, f in feats.items()}
    am2, ali2, tri, T = train_lda_mllt(
        raw, corpus.transcripts, lang, ali, lang.trans_model,
        LdaMlltTrainOptions(num_iters=8, totgauss=120, max_leaves=30,
                            lda_dim=12, mllt_iters=(2, 4)))
    assert T.shape == (12, 13 * 7 + 1)
    from kaldi_cnn_tpu.features.functional import splice_frames
    lda_feats = {
        u: apply_affine(np.asarray(splice_frames(f, 3, 3)),
                        T).astype(np.float32)
        for u, f in raw.items()
    }
    am3, ali3, xforms = train_sat(
        lda_feats, corpus.transcripts, tri, ali2,
        opts=SatTrainOptions(num_iters=6, totgauss=150,
                             fmllr_iters=(2, 4), fmllr_min_count=30.0))
    assert len(xforms) > 0
