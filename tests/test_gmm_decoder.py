"""GMM + Viterbi decoder unit tests (style: gmm/diag-gmm-test.cc,
decoder behavior checks against brute-force DP)."""

import math

import numpy as np
import pytest

from kaldi_cnn_tpu.decode.decoder import viterbi_align, viterbi_decode
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.decode.score import edit_distance, wer_details
from kaldi_cnn_tpu.gmm.diag_gmm import DiagGmm, DiagGmmAccs
from kaldi_cnn_tpu.lang.fst import Fst


def test_diag_gmm_loglike_matches_formula(rng):
    K, D = 3, 5
    g = DiagGmm(rng.dirichlet(np.ones(K)), rng.normal(size=(K, D)),
                rng.uniform(0.5, 2.0, (K, D)))
    x = rng.normal(size=(4, D))
    ll = g.loglikes(x)
    # brute force
    for t in range(4):
        acc = -np.inf
        for k in range(K):
            lp = math.log(g.weights[k]) - 0.5 * (
                D * math.log(2 * math.pi)
                + np.log(g.vars[k]).sum()
                + ((x[t] - g.means[k]) ** 2 / g.vars[k]).sum())
            acc = np.logaddexp(acc, lp)
        assert ll[t] == pytest.approx(acc, abs=1e-8)


def test_diag_gmm_em_fits_two_clusters(rng):
    x = np.concatenate([rng.normal(-3, 0.5, (400, 2)),
                        rng.normal(3, 0.5, (400, 2))])
    g = DiagGmm.from_stats(x.mean(0), x.var(0)).split(2, rng)
    for _ in range(10):
        acc = DiagGmmAccs(g.num_gauss, 2)
        acc.accumulate(g, x, np.ones(len(x)))
        g = acc.update(g)
    centers = sorted(g.means[:, 0])
    assert centers[0] == pytest.approx(-3, abs=0.3)
    assert centers[1] == pytest.approx(3, abs=0.3)


def _chain_graph(num_pdfs=3):
    """Linear HMM chain: state i emits pdf i via tid i+1 with self-loop,
    then advances via tid num_pdfs+i+1."""
    f = Fst()
    states = [f.add_state() for _ in range(num_pdfs + 1)]
    f.start = states[0]
    tid2pdf = [0] * (2 * num_pdfs + 1)
    for i in range(num_pdfs):
        self_tid = i + 1
        fwd_tid = num_pdfs + i + 1
        tid2pdf[self_tid] = i
        tid2pdf[fwd_tid] = i
        f.add_arc(states[i], self_tid, 0, 0.7, states[i])
        f.add_arc(states[i], fwd_tid, 0, 0.35, states[i + 1])
    f.set_final(states[-1], 0.0)
    return CompiledGraph(f, np.asarray(tid2pdf)), tid2pdf


def test_viterbi_align_picks_obvious_segmentation():
    g, tid2pdf = _chain_graph(3)
    # 6 frames: 2 frames clearly pdf0, 2 pdf1, 2 pdf2
    ll = np.full((6, 3), -10.0, np.float32)
    for t in range(6):
        ll[t, t // 2] = 0.0
    ali = viterbi_align(g, ll, acoustic_scale=1.0)
    assert ali is not None and len(ali) == 6
    pdfs = [tid2pdf[t] for t in ali]
    assert pdfs == [0, 0, 1, 1, 2, 2]


def test_viterbi_align_none_when_too_short():
    g, _ = _chain_graph(3)
    # 2 frames cannot traverse 3 emitting states
    ll = np.zeros((2, 3), np.float32)
    assert viterbi_align(g, ll) is None


def test_viterbi_decode_emits_olabels():
    # graph: two parallel word branches, word chosen by acoustics
    f = Fst()
    s0, sa, sb, sf = [f.add_state() for _ in range(4)]
    f.start = s0
    # word 7 -> pdf 0 (tid 1); word 8 -> pdf 1 (tid 2); 2 frames each
    f.add_arc(s0, 1, 7, 0.0, sa)
    f.add_arc(sa, 1, 0, 0.0, sf)
    f.add_arc(s0, 2, 8, 0.0, sb)
    f.add_arc(sb, 2, 0, 0.0, sf)
    f.set_final(sf, 0.0)
    g = CompiledGraph(f, np.asarray([0, 0, 1]))
    ll = np.asarray([[0.0, -5.0], [0.0, -5.0]], np.float32)
    tids, words, cost = viterbi_decode(g, ll, acoustic_scale=1.0,
                                       beam=100.0)
    assert list(words) == [7]
    ll2 = ll[:, ::-1].copy()
    _, words2, _ = viterbi_decode(g, ll2, acoustic_scale=1.0, beam=100.0)
    assert list(words2) == [8]


def test_beam_pruning_keeps_best_path():
    g, tid2pdf = _chain_graph(4)
    rng = np.random.default_rng(0)
    ll = rng.normal(0, 1, (12, 4)).astype(np.float32)
    full = viterbi_decode(g, ll, acoustic_scale=1.0, beam=np.inf,
                          max_active=0)
    pruned = viterbi_decode(g, ll, acoustic_scale=1.0, beam=50.0,
                            max_active=1000)
    assert full[2] == pytest.approx(pruned[2], abs=1e-4)
    assert list(full[0]) == list(pruned[0])


def test_edit_distance():
    assert edit_distance("abc", "abc") == (0, 0, 0, 0)
    assert edit_distance("abc", "axc") == (1, 1, 0, 0)
    assert edit_distance("abc", "abxc") == (1, 0, 1, 0)
    assert edit_distance("abc", "ac") == (1, 0, 0, 1)
    e, s, i, d = edit_distance("kitten", "sitting")
    assert e == 3


def test_wer_details():
    refs = {"u1": ["yes", "no"], "u2": ["no"]}
    hyps = {"u1": ["yes", "no"], "u2": ["yes"]}
    r = wer_details(refs, hyps)
    assert r["words"] == 3
    assert r["errors"] == 1
    assert r["wer"] == pytest.approx(100.0 / 3)
