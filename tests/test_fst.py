"""WFST algorithm tests, following the reference's randomized
equivalence-testing pattern (fstext/determinize-star-test.cc with
fst::RandEquivalent)."""

import math

import numpy as np
import pytest

from kaldi_cnn_tpu.lang.fst import (
    EPS, Fst, accepts_cost, compose, determinize_star, equivalent,
    remove_eps, transduce_cost)


def rand_fst(rng, num_states=6, num_arcs=12, num_ilabels=3, num_olabels=3,
             eps_prob=0.2, acyclic=False):
    f = Fst()
    for _ in range(num_states):
        f.add_state()
    f.start = 0
    for s in rng.choice(num_states, size=max(1, num_states // 2),
                        replace=False):
        f.set_final(int(s), float(rng.random()))
    for _ in range(num_arcs):
        s = int(rng.integers(num_states))
        d = int(rng.integers(num_states))
        if acyclic:
            if s >= num_states - 1:
                continue
            d = int(rng.integers(s + 1, num_states))
        il = 0 if rng.random() < eps_prob else int(rng.integers(1, num_ilabels + 1))
        ol = 0 if rng.random() < eps_prob else int(rng.integers(1, num_olabels + 1))
        f.add_arc(s, il, ol, float(rng.random()), d)
    return f.connect()


def test_linear_and_shortest_path():
    f = Fst.linear([1, 2, 3], weight_per_arc=0.5)
    ils, ols, cost = f.shortest_path()
    assert ils == [1, 2, 3]
    assert ols == [1, 2, 3]
    assert cost == pytest.approx(1.5)


def test_connect_removes_dead_states():
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, 0.0, 1)
    f.add_arc(0, 2, 2, 0.0, 2)  # state 2 is a dead end
    f.set_final(1, 0.0)
    f.add_arc(3, 1, 1, 0.0, 1)  # state 3 unreachable
    f.connect()
    assert f.num_states == 2


def test_compose_simple_transduction():
    # a:b then b:c => a:c
    f1 = Fst.linear([1], olabels=[2])
    f2 = Fst.linear([2], olabels=[3])
    c = compose(f1, f2)
    ils, ols, cost = c.shortest_path()
    assert (ils, ols) == ([1], [3])


def test_compose_with_eps():
    # f1 outputs eps then 2; f2 maps 2->5. Result: input [1,3] -> output [5]
    f1 = Fst()
    s0, s1, s2 = f1.add_state(), f1.add_state(), f1.add_state()
    f1.start = s0
    f1.add_arc(s0, 1, EPS, 0.1, s1)
    f1.add_arc(s1, 3, 2, 0.2, s2)
    f1.set_final(s2, 0.0)
    f2 = Fst.linear([2], olabels=[5])
    c = compose(f1, f2)
    assert transduce_cost(c, [1, 3], [5]) == pytest.approx(0.3)


def test_compose_matches_bruteforce_costs():
    rng = np.random.default_rng(3)
    for trial in range(8):
        a = rand_fst(rng, num_ilabels=2, num_olabels=2, acyclic=True)
        b = rand_fst(rng, num_ilabels=2, num_olabels=2, acyclic=True)
        if a.start < 0 or b.start < 0:
            continue
        c = compose(a, b)
        # sampled sequences: cost through c == min over mid of a(i->m)+b(m->o)
        for iseq in ([], [1], [2], [1, 1], [1, 2], [2, 1, 1]):
            for oseq in ([], [1], [2], [1, 2]):
                direct = transduce_cost(c, iseq, oseq) if c.start >= 0 else math.inf
                best = math.inf
                for mseq in _all_seqs(2, 4):
                    ca = transduce_cost(a, iseq, mseq)
                    cb = transduce_cost(b, mseq, oseq)
                    best = min(best, ca + cb)
                if math.isinf(best):
                    assert math.isinf(direct)
                else:
                    assert direct == pytest.approx(best, abs=1e-4)


def _all_seqs(num_labels, max_len):
    out = [[]]
    frontier = [[]]
    for _ in range(max_len):
        nxt = []
        for seq in frontier:
            for l in range(1, num_labels + 1):
                nxt.append(seq + [l])
        out.extend(nxt)
        frontier = nxt
    return out


def test_determinize_star_equivalence_acyclic():
    rng = np.random.default_rng(7)
    for trial in range(10):
        f = rand_fst(rng, num_states=7, num_arcs=14, acyclic=True)
        if f.start < 0:
            continue
        d = determinize_star(f)
        assert equivalent(f, d, n=25, rng=np.random.default_rng(trial))
        # determinism on the input tape: no eps-input arcs out of subset
        # states with real arcs, no duplicate ilabels
        for s in range(d.num_states):
            ils = [a.ilabel for a in d.arcs[s] if a.ilabel != EPS]
            assert len(ils) == len(set(ils))


def test_determinize_star_removes_input_eps():
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, EPS, 4, 0.5, s1)  # input-eps with output
    f.add_arc(s1, 2, 5, 0.25, s2)
    f.set_final(s2, 0.0)
    d = determinize_star(f)
    assert transduce_cost(d, [2], [4, 5]) == pytest.approx(0.75)


def test_determinize_star_merges_weights():
    # two paths for same input, min weight must survive
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, 1, 1, 0.3, s1)
    f.add_arc(s0, 1, 1, 0.7, s2)
    f.set_final(s1, 0.0)
    f.set_final(s2, 0.0)
    d = determinize_star(f)
    assert accepts_cost(d, [1]) == pytest.approx(0.3)
    # single arc out of start
    assert len(d.arcs[d.start]) == 1


def test_remove_eps():
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, EPS, EPS, 0.25, s1)
    f.add_arc(s1, 3, 3, 0.5, s2)
    f.set_final(s2, 0.0)
    g = remove_eps(f)
    for s in range(g.num_states):
        for a in g.arcs[s]:
            assert not (a.ilabel == EPS and a.olabel == EPS)
    assert accepts_cost(g, [3]) == pytest.approx(0.75)
