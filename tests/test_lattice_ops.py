"""Tests for lattice push/minimize and const-ARPA LM rescoring
(ref patterns: lat/push-lattice-test.cc, minimize-lattice-test.cc,
lm/const-arpa tests via lattice-lmrescore equivalence)."""

import math

import numpy as np
import pytest

from kaldi_cnn_tpu.decode.lattice import (
    Lattice, lm_rescore, minimize_lattice, nbest, push_lattice,
    shortest_path)
from kaldi_cnn_tpu.lang.arpa import (
    estimate_bigram_arpa, make_unigram_arpa, parse_arpa)
from kaldi_cnn_tpu.lang.const_arpa import ConstArpaLm

LOG10 = math.log(10.0)


def diamond_lattice():
    """Two word paths: 0 -[w1]-> 1 -> 3, 0 -[w2]-> 2 -> 3 with
    differing graph/acoustic costs plus a shared suffix state."""
    return Lattice(
        num_states=4, start=0,
        state_time=np.asarray([0, 1, 1, 2], np.int32),
        arc_src=np.asarray([0, 0, 1, 2], np.int32),
        arc_dst=np.asarray([1, 2, 3, 3], np.int32),
        arc_ilabel=np.asarray([5, 6, 7, 7], np.int32),
        arc_olabel=np.asarray([1, 2, 0, 0], np.int32),
        arc_graph=np.asarray([1.0, 2.0, 0.5, 0.5], np.float32),
        arc_acoustic=np.asarray([3.0, 1.5, 1.0, 1.0], np.float32),
        final_graph=np.asarray([np.inf, np.inf, np.inf, 0.25],
                               np.float32))


def path_costs(lat, **kw):
    return sorted((tuple(w), round(c, 5))
                  for w, c in nbest(lat, 10, **kw))


def test_push_preserves_paths_and_zeroes_suffix_cost():
    lat = diamond_lattice()
    pushed = push_lattice(lat)
    assert path_costs(lat) == path_costs(pushed)
    # after pushing, min (graph+acoustic+final) cost from every
    # non-start co-accessible state to a final state is 0
    w = pushed.arc_graph.astype(np.float64) + pushed.arc_acoustic
    fin = np.where(np.isfinite(pushed.final_graph),
                   pushed.final_graph.astype(np.float64), np.inf)
    phi = pushed.sweep_min_backward(w, fin)
    for s in range(1, pushed.num_states):
        if np.isfinite(phi[s]):
            assert phi[s] == pytest.approx(0.0, abs=1e-5)


def test_minimize_merges_identical_suffixes():
    lat = diamond_lattice()
    mini = minimize_lattice(lat)
    # states 1 and 2 have identical outgoing arcs and finals -> merge
    assert mini.num_states == 3
    assert path_costs(lat) == path_costs(mini)


def test_minimize_keeps_distinct_suffixes():
    lat = diamond_lattice()
    lat.arc_graph = np.asarray([1.0, 2.0, 0.5, 0.75], np.float32)
    mini = minimize_lattice(lat)
    assert mini.num_states == 4
    assert path_costs(lat) == path_costs(mini)


@pytest.fixture(scope="module")
def bigram_lm():
    arpa = estimate_bigram_arpa(
        [["yes", "no"], ["yes", "yes"], ["no", "yes"],
         ["no"], ["yes", "no", "yes"]])
    lm = parse_arpa(arpa)
    vocab = {"<s>": 10, "</s>": 11, "yes": 1, "no": 2}
    return lm, ConstArpaLm.from_arpa(lm, vocab)


def _raw_logprob(lm, hist, word):
    """Direct ARPA backoff evaluation from the parsed tables."""
    ng = tuple(hist) + (word,)
    if ng in lm.orders[len(ng) - 1]:
        return lm.orders[len(ng) - 1][ng][0] * LOG10
    bo = 0.0
    if tuple(hist) in lm.orders[len(hist) - 1]:
        bo = lm.orders[len(hist) - 1][tuple(hist)][1] * LOG10
    return bo + lm.orders[0][(word,)][0] * LOG10


def test_const_arpa_matches_raw_backoff(bigram_lm):
    lm, const = bigram_lm
    ids = {w: const.vocab[w] for w in ("yes", "no", "<s>", "</s>")}
    for h in ("yes", "no", "<s>"):
        for w in ("yes", "no", "</s>"):
            want = _raw_logprob(lm, [h], w)
            got = const.log_prob([ids[h]], ids[w])
            assert got == pytest.approx(want, abs=1e-9), (h, w)


def test_const_arpa_save_load_roundtrip(bigram_lm, tmp_path):
    _, const = bigram_lm
    path = str(tmp_path / "lm.npz")
    const.save(path)
    loaded = ConstArpaLm.load(path)
    y, n = const.vocab["yes"], const.vocab["no"]
    assert loaded.sentence_logprob([y, n, y]) == pytest.approx(
        const.sentence_logprob([y, n, y]))
    assert loaded.vocab == const.vocab


def test_lm_rescore_adds_sentence_logprob(bigram_lm):
    _, const = bigram_lm
    lat = diamond_lattice()     # olabels 1 = yes, 2 = no
    res = lm_rescore(lat, const, scale=1.0)
    base = dict(path_costs(lat))
    got = dict(path_costs(res))
    for words, cost in base.items():
        add = -const.sentence_logprob(list(words))
        assert got[words] == pytest.approx(cost + add, abs=1e-4)


def test_lm_rescore_roundtrip_cancels(bigram_lm):
    _, const = bigram_lm
    lat = diamond_lattice()
    back = lm_rescore(lm_rescore(lat, const, 1.0), const, -1.0)
    assert path_costs(back) == path_costs(lat)


def test_lm_rescore_changes_ranking():
    """A heavily skewed unigram LM flips which path wins."""
    lat = diamond_lattice()    # acoustic+graph favors path 'no' (2)
    _, words0, _ = shortest_path(lat)
    assert list(words0) == [2]
    arpa = parse_arpa(make_unigram_arpa({"yes": 0.999, "no": 0.001}))
    const = ConstArpaLm.from_arpa(
        arpa, {"yes": 1, "no": 2, "<s>": 10, "</s>": 11})
    res = lm_rescore(lat, const, scale=4.0)
    _, words1, _ = shortest_path(res)
    assert list(words1) == [1]
