"""Native C++ Viterbi vs numpy oracle (SURVEY.md §4 oracle pattern)."""

import numpy as np
import pytest

from kaldi_cnn_tpu import native
from kaldi_cnn_tpu.decode.decoder import _viterbi, _viterbi_native
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
from kaldi_cnn_tpu.lang.hclg import Lang, make_hclg_from_arpa
from kaldi_cnn_tpu.recipes import synthetic
from kaldi_cnn_tpu.recipes.yesno import compute_features

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def setup():
    from kaldi_cnn_tpu.gmm.train import MonoTrainOptions, train_mono
    lex = synthetic.yesno_lexicon()
    wp = {"yes": 0.5, "no": 0.5}
    corpus = synthetic.make_corpus(lex, wp, 14, 1, 2, 41)
    feats = compute_features(corpus, seed=41)
    lang = Lang.create(lex)
    am, _ = train_mono(feats, corpus.transcripts, lang,
                       MonoTrainOptions(num_iters=6, totgauss=80))
    hclg = CompiledGraph(make_hclg_from_arpa(lang, make_unigram_arpa(wp)),
                         lang.trans_model.trans_id_to_pdf_array())
    return corpus, feats, lang, am, hclg


def _numpy_viterbi(g, ll, **kw):
    """Call the pure-numpy path by wrapping the graph in a subclass."""
    class _G(CompiledGraph):
        def __init__(self):
            self.__dict__.update(g.__dict__)
    return _viterbi(_G(), ll, **kw)


def test_native_matches_numpy_decode(setup):
    corpus, feats, lang, am, hclg = setup
    for utt in list(feats)[:6]:
        ll = am.loglikes(feats[utt])
        for kw in ({"acoustic_scale": 0.1, "beam": np.inf},
                   {"acoustic_scale": 0.1, "beam": 40.0,
                    "word_ins_penalty": -0.5},
                   {"acoustic_scale": 0.2, "beam": np.inf,
                    "max_active": 50}):
            rn = _viterbi_native(hclg, ll, kw.get("acoustic_scale", 0.1),
                                 kw.get("beam", np.inf),
                                 kw.get("max_active", 0), False,
                                 kw.get("word_ins_penalty", 0.0))
            rp = _numpy_viterbi(hclg, ll, **kw)
            assert list(rn[1]) == list(rp[1]), kw
            assert rn[2] == pytest.approx(rp[2], abs=1e-2), kw
            assert len(rn[0]) == len(rp[0])


def test_native_align_matches(setup):
    from kaldi_cnn_tpu.lang.hclg import compile_training_graph
    corpus, feats, lang, am, hclg = setup
    tid2pdf = lang.trans_model.trans_id_to_pdf_array()
    utt = next(iter(feats))
    g = CompiledGraph(compile_training_graph(lang, corpus.transcripts[utt]),
                      tid2pdf)
    ll = am.loglikes(feats[utt])
    rn = _viterbi_native(g, ll, 1.0, np.inf, 0, True, 0.0)
    rp = _numpy_viterbi(g, ll, acoustic_scale=1.0, beam=np.inf,
                        require_final=True)
    assert len(rn[0]) == ll.shape[0]
    # alignments must match exactly (unique best path in practice)
    assert list(rn[0]) == list(rp[0])
    assert rn[2] == pytest.approx(rp[2], abs=1e-2)


def test_native_ark_index_matches_python(tmp_path, rng):
    from kaldi_cnn_tpu.io.kaldi_io import read_ark, write_ark
    from kaldi_cnn_tpu.io.native_io import (
        ArkIndex, RandomAccessArkReader, SequentialArkReader)
    data = {
        "utt_a": rng.normal(size=(17, 13)).astype(np.float32),
        "utt_b": rng.normal(size=(5, 4)).astype(np.float64),
        "utt_c": rng.normal(size=23).astype(np.float32),
        "utt_d": np.asarray([3, 1, 4, 1, 5, 9], np.int32),
    }
    path = str(tmp_path / "mixed.ark")
    write_ark(path, data)
    seq = dict(SequentialArkReader(path))
    assert list(seq) == list(data)
    for k, v in data.items():
        np.testing.assert_array_equal(seq[k], v)
    ra = RandomAccessArkReader(path)
    assert "utt_b" in ra and "nope" not in ra
    np.testing.assert_array_equal(ra["utt_d"], data["utt_d"])
    np.testing.assert_array_equal(ra["utt_a"], data["utt_a"])
    # python reader agrees entry by entry
    for (k1, v1), (k2, v2) in zip(read_ark(path), seq.items()):
        assert k1 == k2
        np.testing.assert_array_equal(v1, v2)


def test_native_ark_index_large_count(tmp_path, rng):
    """More entries than the initial index capacity (1024)."""
    from kaldi_cnn_tpu.io.kaldi_io import write_ark
    from kaldi_cnn_tpu.io.native_io import SequentialArkReader
    data = {f"u{i:05d}": rng.normal(size=(2, 3)).astype(np.float32)
            for i in range(1500)}
    path = str(tmp_path / "big.ark")
    write_ark(path, data)
    seq = dict(SequentialArkReader(path))
    assert len(seq) == 1500
    np.testing.assert_array_equal(seq["u01499"], data["u01499"])
