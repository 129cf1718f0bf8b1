"""Lexicon/ARPA/topology/transition-model/HCLG tests
(style: hmm/transition-model-test.cc, graph-level checks of mkgraph)."""

import math

import numpy as np
import pytest

from kaldi_cnn_tpu.lang import (
    Lang, Lexicon, MonophoneContextDependency, TransitionModel,
    compile_training_graph, make_hclg, make_lexicon_fst, parse_arpa,
    arpa_to_fst)
from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
from kaldi_cnn_tpu.lang.fst import EPS, accepts_cost, compose, transduce_cost
from kaldi_cnn_tpu.lang.hclg import make_hclg_from_arpa
from kaldi_cnn_tpu.lang.topology import HmmTopology


def tiny_lexicon():
    return Lexicon(entries={
        "yes": [(["Y", "EH", "S"], 1.0)],
        "no": [(["N", "OW"], 1.0)],
    }, silence_phone="SIL", optional_silence_prob=0.5)


def test_lexicon_fst_transduces_words():
    lex = tiny_lexicon()
    pt, wt, _ = lex.make_symbol_tables()
    L = make_lexicon_fst(lex, pt, wt)
    phones = pt.ids(["Y", "EH", "S"])
    cost = transduce_cost(L, phones, [wt.id("yes")])
    assert math.isfinite(cost)
    # with optional silence after the word
    cost_sil = transduce_cost(L, phones + [pt.id("SIL")], [wt.id("yes")])
    assert math.isfinite(cost_sil)
    # wrong phones rejected
    assert math.isinf(transduce_cost(L, pt.ids(["N", "OW"]), [wt.id("yes")]))


def test_disambig_assignment_for_homophones():
    lex = Lexicon(entries={
        "to": [(["T", "UW"], 1.0)],
        "two": [(["T", "UW"], 1.0)],
        "toot": [(["T", "UW", "T"], 1.0)],
    }, silence_phone=None)
    a = lex._disambig_assignment()
    # homophones get distinct disambig syms; prefix pron gets one too
    assert a[("to", ("T", "UW"))] != a[("two", ("T", "UW"))]
    assert ("to", ("T", "UW")) in a and ("two", ("T", "UW")) in a


def test_arpa_parse_and_g_costs():
    text = make_unigram_arpa({"yes": 0.6, "no": 0.4})
    lm = parse_arpa(text)
    assert lm.max_order == 1
    lex = tiny_lexicon()
    _, wt, _ = lex.make_symbol_tables()
    g = arpa_to_fst(lm, wt)
    c_yes = accepts_cost(g, [wt.id("yes")])
    c_no = accepts_cost(g, [wt.id("no")])
    assert c_yes < c_no  # yes more probable
    # cost difference = log(0.6/0.4) ~ their prob ratio
    assert (c_no - c_yes) == pytest.approx(math.log(0.6 / 0.4), abs=1e-3)


def test_bigram_arpa_to_fst():
    text = "\n".join([
        "\\data\\", "ngram 1=4", "ngram 2=3", "",
        "\\1-grams:",
        "-0.5 </s>",
        "-99 <s> -0.3",
        "-0.7 yes -0.2",
        "-0.7 no -0.2",
        "",
        "\\2-grams:",
        "-0.1 <s> yes",
        "-0.2 yes no",
        "-0.3 no </s>",
        "", "\\end\\",
    ])
    lm = parse_arpa(text)
    assert lm.max_order == 2
    lex = tiny_lexicon()
    _, wt, _ = lex.make_symbol_tables()
    g = arpa_to_fst(lm, wt)
    # path <s> yes no </s> exists with backoff-free bigram costs where present
    cost = accepts_cost(g, [wt.id("yes"), wt.id("no")])
    assert math.isfinite(cost)


def test_transition_model_structure():
    lex = tiny_lexicon()
    lang = Lang.create(lex)
    tm = lang.trans_model
    # 6 phones (incl SIL) x 3 states
    assert tm.num_pdfs == len(lex.phones) * 3
    assert tm.num_transition_states == tm.num_pdfs
    assert tm.num_transition_ids == tm.num_transition_states * 2
    # id<->pair roundtrip and pdf consistency
    for ts in range(1, tm.num_transition_states + 1):
        for idx in range(2):
            tid = tm.pair_to_id(ts, idx)
            assert tm.id_to_state(tid) == ts
        sl = tm.self_loop_id(ts)
        assert sl > 0 and tm.is_self_loop(sl)
    arr = tm.trans_id_to_pdf_array()
    assert arr.shape == (tm.num_transition_ids + 1,)


def test_transition_model_mle_update():
    lang = Lang.create(tiny_lexicon())
    tm = lang.trans_model
    stats = np.zeros(tm.num_transition_ids + 1)
    # make self-loops 9x more frequent than forward
    for ts in range(1, tm.num_transition_states + 1):
        stats[tm.self_loop_id(ts)] = 90
        for idx in range(2):
            tid = tm.pair_to_id(ts, idx)
            if not tm.is_self_loop(tid):
                stats[tid] = 10
    impr = tm.mle_update(stats)
    assert impr > 0
    sl = tm.self_loop_id(1)
    assert math.exp(tm.log_probs[sl]) == pytest.approx(0.9, abs=1e-6)


def test_training_graph_accepts_alignment():
    lang = Lang.create(tiny_lexicon())
    tm = lang.trans_model
    graph = compile_training_graph(lang, ["yes"], self_loop_scale=1.0)
    # build the forced alignment: for each phone Y EH S, 3 states, stay
    # 2 frames each (self-loop once then forward)
    pt = lang.phone_table
    tids = []
    for ph in ["Y", "EH", "S"]:
        p = pt.id(ph)
        for st in range(3):
            pdf = lang.ctx_dep.compute([p], st)
            ts = tm.tuple_to_state(p, st, pdf)
            tids.append(tm.self_loop_id(ts))
            fwd = [tm.pair_to_id(ts, i) for i in range(2)
                   if not tm.is_self_loop(tm.pair_to_id(ts, i))][0]
            tids.append(fwd)
    cost = transduce_cost(graph, tids, [lang.word_table.id("yes")])
    assert math.isfinite(cost)
    # a wrong-phone alignment is rejected
    bad = list(reversed(tids))
    assert math.isinf(transduce_cost(graph, bad,
                                     [lang.word_table.id("yes")]))


def test_hclg_best_path_words():
    lang = Lang.create(tiny_lexicon())
    arpa = make_unigram_arpa({"yes": 0.5, "no": 0.5})
    hclg = make_hclg_from_arpa(lang, arpa)
    assert hclg.num_states > 0
    ils, ols, cost = hclg.shortest_path()
    # best path emits a word sequence; all ilabels are valid trans-ids
    tm = lang.trans_model
    for t in ils:
        assert 1 <= t <= tm.num_transition_ids
    words = [lang.word_table.sym(o) for o in ols]
    assert all(w in ("yes", "no") for w in words)


def test_estimate_bigram_arpa_roundtrip():
    from kaldi_cnn_tpu.lang.arpa import estimate_bigram_arpa
    transcripts = [["yes", "no"], ["yes", "no"], ["yes", "yes"],
                   ["no", "yes", "no"]]
    text = estimate_bigram_arpa(transcripts)
    lm = parse_arpa(text)
    assert lm.max_order == 2
    lex = tiny_lexicon()
    _, wt, _ = lex.make_symbol_tables()
    g = arpa_to_fst(lm, wt)
    # project the #0 backoff ilabel to eps (as rmdisambig does after
    # composition) so accepts_cost can traverse backoff arcs
    bo = wt.id("#0")
    for s in range(g.num_states):
        for a in g.arcs[s]:
            if a.ilabel == bo:
                a.ilabel = EPS
    # frequent path (yes no: 3 counts) cheaper than rare (no no: unseen,
    # goes through backoff)
    c_seen = accepts_cost(g, [wt.id("yes"), wt.id("no")])
    c_unseen = accepts_cost(g, [wt.id("no"), wt.id("no")])
    assert math.isfinite(c_seen) and math.isfinite(c_unseen)
    assert c_seen < c_unseen


def test_large_lexicon_unique_prons():
    from kaldi_cnn_tpu.recipes.synthetic import large_lexicon
    lex = large_lexicon(num_words=40)
    assert len(lex.entries) == 40
    prons = [tuple(p) for e in lex.entries.values() for p, _ in e]
    assert len(set(prons)) == len(prons)
