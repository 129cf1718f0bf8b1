"""Decision-tree layer tests (ref test pattern: tree/build-tree-test.cc
randomized stats + self-checks; hmm/transition-model-test.cc)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.lang.hclg import Lang, compile_training_graph
from kaldi_cnn_tpu.lang.context import compose_context
from kaldi_cnn_tpu.lang.fst import Fst, EPS
from kaldi_cnn_tpu.recipes import synthetic
from kaldi_cnn_tpu.tree import (
    KEY_PDF_CLASS, ConstantEventMap, GaussStats, SplitEventMap,
    TableEventMap, TreeContextDependency, accumulate_tree_stats,
    build_tree, questions_for_keys, split_to_phones)


def test_event_map_basics():
    em = TableEventMap(1, {
        1: ConstantEventMap(0),
        2: SplitEventMap(0, frozenset([1]), ConstantEventMap(1),
                         ConstantEventMap(2)),
    })
    assert em.map({1: 1, 0: 5}) == 0
    assert em.map({1: 2, 0: 1}) == 1
    assert em.map({1: 2, 0: 9}) == 2
    assert em.map({1: 3}) is None
    assert em.multi_map({1: 2}, [0]) == {1, 2}
    assert em.multi_map({}, [0, 1]) == {0, 1, 2}
    assert em.max_answer() == 2


def test_gauss_stats_objf_improves_on_split():
    rng = np.random.default_rng(0)
    a, b = GaussStats(), GaussStats()
    for _ in range(100):
        a.add_frame(rng.normal(0.0, 1.0, 5))
        b.add_frame(rng.normal(5.0, 1.0, 5))
    tot = GaussStats().add(a).add(b)
    gain = a.objf() + b.objf() - tot.objf()
    assert gain > 100.0  # separating two far-apart Gaussians helps a lot


def _mono_system(num_utts=12, seed=3):
    lex = synthetic.yesno_lexicon()
    corpus = synthetic.make_corpus(lex, {"yes": 0.5, "no": 0.5},
                                   num_utts, 1, 2, seed)
    from kaldi_cnn_tpu.recipes.yesno import compute_features
    feats = compute_features(corpus, seed=seed)
    lang = Lang.create(lex)
    from kaldi_cnn_tpu.gmm.train import MonoTrainOptions, train_mono
    am, ali = train_mono(feats, corpus.transcripts, lang,
                         MonoTrainOptions(num_iters=6, totgauss=60))
    return corpus, feats, lang, am, ali


@pytest.fixture(scope="module")
def mono_system():
    return _mono_system()


def test_split_to_phones_matches_transcript(mono_system):
    corpus, feats, lang, am, ali = mono_system
    lex = corpus.lexicon
    for utt in list(ali)[:4]:
        segs = split_to_phones(lang.trans_model, ali[utt])
        phones = [lang.phone_table.sym(p) for p, _ in segs]
        # frames partition the utterance
        all_frames = [t for _, fr in segs for t in fr]
        assert all_frames == list(range(len(ali[utt])))
        # non-silence phones spell the transcript
        spelled = [p for p in phones if p != "SIL"]
        expect = []
        for w in corpus.transcripts[utt]:
            expect.extend(lex.entries[w][0][0])
        assert spelled == expect


def test_build_tree_and_context_dependency(mono_system):
    corpus, feats, lang, am, ali = mono_system
    tm = lang.trans_model
    stats = accumulate_tree_stats(tm, feats, ali)
    questions = questions_for_keys(stats)
    ctx = build_tree(stats, questions, lang.topo, max_leaves=40)
    assert isinstance(ctx, TreeContextDependency)
    assert ctx.num_pdfs >= lang.ctx_dep.num_pdfs  # at least mono leaves
    # total: every seen event maps somewhere in range
    for key in stats:
        ev = dict(key)
        window = [ev[k] for k in range(3)]
        pdf = ctx.compute(window, ev[KEY_PDF_CLASS])
        assert 0 <= pdf < ctx.num_pdfs
    # pdf_info covers compute()
    for key in stats:
        ev = dict(key)
        window = [ev[k] for k in range(3)]
        pdf = ctx.compute(window, ev[KEY_PDF_CLASS])
        assert pdf in ctx.pdfs_for(window[1], ev[KEY_PDF_CLASS])


def test_compose_context_window_sequence():
    # linear phone path 3 -> 5 -> 7 becomes windows
    # (0,3,5)(3,5,7)(5,7,0); words ride along
    f = Fst.linear([3, 5, 7], olabels=[11, 0, 12])
    clg, wins = compose_context(f, 3, 1)
    # walk the single path
    s = clg.start
    seen = []
    words = []
    guard = 0
    while not clg.is_final(s):
        arcs = clg.arcs[s]
        assert len(arcs) == 1
        a = arcs[0]
        if a.ilabel != EPS:
            seen.append(wins.window(a.ilabel))
        if a.olabel != EPS:
            words.append(a.olabel)
        s = a.nextstate
        guard += 1
        assert guard < 20
    assert seen == [(0, 3, 5), (3, 5, 7), (5, 7, 0)]
    assert words == [11, 12]


def test_triphone_training_graph_alignment(mono_system):
    """Tree-based Lang must compile training graphs whose alignments
    convert from the mono alignments (ref: convert-ali + train_deltas
    first iteration)."""
    corpus, feats, lang, am, ali = mono_system
    from kaldi_cnn_tpu.gmm.train import build_tree_lang, convert_alignment
    tri = build_tree_lang(feats, ali, lang, max_leaves=30)
    assert tri.trans_model.num_pdfs >= lang.trans_model.num_pdfs
    utt = next(iter(ali))
    tids = convert_alignment(lang.trans_model, tri, ali[utt])
    assert len(tids) == len(ali[utt])
    # converted alignment preserves the phone sequence
    old_phones = [p for p, _ in split_to_phones(lang.trans_model, ali[utt])]
    new_phones = [p for p, _ in split_to_phones(tri.trans_model, tids)]
    assert old_phones == new_phones
    # and is accepted by the triphone training graph
    g = compile_training_graph(tri, corpus.transcripts[utt])
    from kaldi_cnn_tpu.lang.fst import accepts_cost
    assert np.isfinite(accepts_cost(g, [int(t) for t in tids]))
