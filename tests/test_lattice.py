"""Lattice layer tests (ref patterns: lat/kaldi-lattice-test.cc,
lattice-functions tests: best path == Viterbi, posteriors sum to 1
per frame, pruning keeps the best path)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.decode.decoder import lattice_decode, viterbi_decode
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.decode.lattice import (
    arc_posteriors, confusion_network, determinize_lattice, mbr_decode,
    nbest, prune_lattice, shortest_path)
from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
from kaldi_cnn_tpu.lang.hclg import Lang, make_hclg_from_arpa
from kaldi_cnn_tpu.recipes import synthetic
from kaldi_cnn_tpu.recipes.yesno import compute_features


@pytest.fixture(scope="module")
def decode_setup():
    from kaldi_cnn_tpu.gmm.train import MonoTrainOptions, train_mono
    lex = synthetic.yesno_lexicon()
    wp = {"yes": 0.5, "no": 0.5}
    corpus = synthetic.make_corpus(lex, wp, 20, 1, 3, 11)
    feats = compute_features(corpus, seed=11)
    lang = Lang.create(lex)
    am, _ = train_mono(feats, corpus.transcripts, lang,
                       MonoTrainOptions(num_iters=8, totgauss=100))
    hclg = CompiledGraph(make_hclg_from_arpa(lang, make_unigram_arpa(wp)),
                         lang.trans_model.trans_id_to_pdf_array())
    return corpus, feats, lang, am, hclg


SCALE = 0.1


def test_lattice_best_path_matches_viterbi(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    for utt in list(feats)[:6]:
        ll = am.loglikes(feats[utt])
        tids_v, words_v, cost_v = viterbi_decode(
            hclg, ll, acoustic_scale=SCALE, beam=np.inf, max_active=0)
        lat = lattice_decode(hclg, ll, acoustic_scale=SCALE,
                             beam=np.inf, lattice_beam=8.0, max_active=0)
        tids_l, words_l, cost_l = shortest_path(
            lat, lm_scale=1.0, acoustic_scale=SCALE)
        assert list(words_l) == list(words_v)
        assert cost_l == pytest.approx(cost_v, abs=1e-2)
        assert len(tids_l) == len(tids_v) == feats[utt].shape[0]


def test_lattice_beam_narrow_still_has_best_path(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    _, words_v, cost_v = viterbi_decode(hclg, ll, acoustic_scale=SCALE,
                                        beam=np.inf, max_active=0)
    lat = lattice_decode(hclg, ll, acoustic_scale=SCALE, beam=np.inf,
                         lattice_beam=0.5, max_active=0)
    _, words_l, cost_l = shortest_path(lat, 1.0, SCALE)
    assert list(words_l) == list(words_v)
    assert cost_l == pytest.approx(cost_v, abs=1e-2)


def test_arc_posteriors_frame_sum(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    lat = lattice_decode(hclg, ll, acoustic_scale=SCALE, beam=np.inf,
                         lattice_beam=10.0, max_active=0)
    post = arc_posteriors(lat, 1.0, SCALE)
    # emitting arcs at each frame have posteriors summing to ~1
    emitting = lat.arc_ilabel > 0
    times = lat.state_time[lat.arc_src[emitting]]
    p = post[emitting]
    T = feats[utt].shape[0]
    sums = np.zeros(T)
    np.add.at(sums, times, p)
    assert np.allclose(sums, 1.0, atol=1e-3)


def test_prune_keeps_best(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    lat = lattice_decode(hclg, ll, acoustic_scale=SCALE, beam=np.inf,
                         lattice_beam=10.0, max_active=0)
    _, words0, cost0 = shortest_path(lat, 1.0, SCALE)
    pruned = prune_lattice(lat, 1.0, 1.0, SCALE)
    assert pruned.num_arcs <= lat.num_arcs
    _, words1, cost1 = shortest_path(pruned, 1.0, SCALE)
    assert list(words1) == list(words0)
    assert cost1 == pytest.approx(cost0, abs=1e-2)


def test_nbest_sorted_and_unique(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    lat = lattice_decode(hclg, ll, acoustic_scale=SCALE, beam=np.inf,
                         lattice_beam=10.0, max_active=0)
    paths = nbest(lat, 5, 1.0, SCALE)
    assert len(paths) >= 1
    costs = [c for _, c in paths]
    assert costs == sorted(costs)
    seqs = [tuple(wseq) for wseq, _ in paths]
    assert len(set(seqs)) == len(seqs)
    # first = best path
    _, words0, cost0 = shortest_path(lat, 1.0, SCALE)
    assert seqs[0] == tuple(words0)
    assert costs[0] == pytest.approx(cost0, abs=1e-2)


def test_determinize_and_mbr(decode_setup):
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    lat = lattice_decode(hclg, ll, acoustic_scale=SCALE, beam=np.inf,
                         lattice_beam=10.0, max_active=0)
    det = determinize_lattice(lat, 1.0, SCALE)
    # determinized lattice keeps the best path with its cost
    _, w0, c0 = shortest_path(lat, 1.0, SCALE)
    _, w1, c1 = shortest_path(det, 1.0, SCALE)
    assert list(w1) == list(w0)
    assert c1 == pytest.approx(c0, abs=1e-2)
    # MBR on a confident lattice agrees with the best path
    hyp = mbr_decode(lat, 1.0, SCALE)
    assert hyp == list(w0)
    cn = confusion_network(lat, 1.0, SCALE)
    for slot in cn:
        tot = sum(p for _, p in slot)
        assert tot <= 1.5  # posterior mass sane


def test_rescoring_sweep_changes_result(decode_setup):
    """Lattice rescoring must reproduce re-decoding at a different
    acoustic scale (the point of keeping unscaled acoustic costs)."""
    corpus, feats, lang, am, hclg = decode_setup
    utt = next(iter(feats))
    ll = am.loglikes(feats[utt])
    lat = lattice_decode(hclg, ll, acoustic_scale=0.1, beam=np.inf,
                         lattice_beam=30.0, max_active=0)
    for s in (0.05, 0.2):
        _, words_r, cost_r = shortest_path(lat, 1.0, s)
        _, words_d, cost_d = viterbi_decode(hclg, ll, acoustic_scale=s,
                                            beam=np.inf, max_active=0)
        assert list(words_r) == list(words_d)
        assert cost_r == pytest.approx(cost_d, rel=1e-4, abs=1e-2)


def test_lattice_save_load_roundtrip(decode_setup, tmp_path):
    import io as _io
    from kaldi_cnn_tpu.decode.lattice import (
        load_lattices, save_lattices, write_lattice_text)
    corpus, feats, lang, am, hclg = decode_setup
    lats = {}
    for utt in list(feats)[:3]:
        ll = am.loglikes(feats[utt])
        lats[utt] = lattice_decode(hclg, ll, acoustic_scale=SCALE,
                                   beam=60.0, lattice_beam=8.0,
                                   max_active=0)
    p = str(tmp_path / "lat.npz")
    save_lattices(p, lats)
    back = load_lattices(p)
    assert set(back) == set(lats)
    for u in lats:
        _, w0, c0 = shortest_path(lats[u], 1.0, SCALE)
        _, w1, c1 = shortest_path(back[u], 1.0, SCALE)
        assert list(w0) == list(w1)
        assert c0 == pytest.approx(c1, abs=1e-3)
    buf = _io.StringIO()
    write_lattice_text(lats[u], buf)
    assert len(buf.getvalue().splitlines()) >= lats[u].num_arcs
