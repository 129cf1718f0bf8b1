"""Kaldi data-dir adapter tests (ref: utils/validate_data_dir.sh,
utils/fix_data_dir.sh, utils/split_data.sh semantics) plus the
reference-interop differential path (external ark alignments)."""

import os

import numpy as np
import pytest

from kaldi_cnn_tpu.recipes import datadir, synthetic
from kaldi_cnn_tpu.recipes.datadir import (
    DataDir, Segment, corpus_from_data_dir, load_alignments_ark,
    read_lexicon_file, write_data_dir, write_key_value_file,
    write_lexicon_file)


def _tiny_corpus(n=8, seed=3):
    lex = synthetic.yesno_lexicon()
    wp = {"yes": 0.5, "no": 0.5}
    return synthetic.make_corpus(lex, wp, n, 1, 2, seed), lex


def test_write_load_roundtrip(tmp_path):
    corpus, lex = _tiny_corpus()
    utt2spk = {u: f"spk{int(u[3:]) % 3}" for u in corpus.waves}
    write_data_dir(str(tmp_path), corpus.waves, corpus.transcripts,
                   utt2spk, corpus.sample_rate)
    dd = DataDir.load(str(tmp_path))
    assert dd.validate() == []
    assert dd.utts() == sorted(corpus.waves)
    assert dd.text == corpus.transcripts
    waves, rate = dd.load_waves()
    assert rate == corpus.sample_rate
    for u in corpus.waves:
        # int16 PCM quantization on write
        assert np.allclose(waves[u], np.round(
            np.clip(corpus.waves[u], -32768, 32767)), atol=1.0)


def test_split_by_speaker(tmp_path):
    corpus, _ = _tiny_corpus(n=12)
    utt2spk = {u: f"spk{int(u[3:]) % 4}" for u in corpus.waves}
    write_data_dir(str(tmp_path), corpus.waves, corpus.transcripts,
                   utt2spk, corpus.sample_rate)
    dd = DataDir.load(str(tmp_path))
    parts = dd.split(3)
    all_utts = sorted(u for p in parts for u in p.utts())
    assert all_utts == dd.utts()
    # no speaker straddles jobs
    spk_in = {}
    for j, p in enumerate(parts):
        for u in p.utts():
            s = p.utt2spk[u]
            assert spk_in.setdefault(s, j) == j


def test_validate_fix_drops_uncovered(tmp_path):
    corpus, _ = _tiny_corpus(n=6)
    write_data_dir(str(tmp_path), corpus.waves, corpus.transcripts,
                   None, corpus.sample_rate)
    # corrupt: drop one utt from text
    dd = DataDir.load(str(tmp_path))
    victim = dd.utts()[0]
    del dd.text[victim]
    issues = dd.validate(fix=True)
    assert issues
    assert victim not in dd.utts()
    assert dd.validate() == []


def test_segments_and_pipe(tmp_path):
    corpus, _ = _tiny_corpus(n=2)
    utts = sorted(corpus.waves)
    long_wave = np.concatenate([corpus.waves[u] for u in utts])
    from kaldi_cnn_tpu.io.wave import write_wave
    wav_path = str(tmp_path / "reco1.wav")
    write_wave(wav_path, long_wave, corpus.sample_rate)
    t0 = len(corpus.waves[utts[0]]) / corpus.sample_rate
    dd = DataDir(
        path=str(tmp_path),
        wav_scp={"reco1": f"cat {wav_path} |"},   # pipe rxfilename
        text={u: corpus.transcripts[u] for u in utts},
        utt2spk={u: "spk0" for u in utts},
        segments={utts[0]: Segment("reco1", 0.0, t0),
                  utts[1]: Segment("reco1", t0, -1.0)})
    assert dd.validate() == []
    waves, rate = dd.load_waves()
    assert rate == corpus.sample_rate
    for u in utts:
        ref = np.round(np.clip(corpus.waves[u], -32768, 32767))
        assert abs(len(waves[u]) - len(ref)) <= 1
        n = min(len(waves[u]), len(ref))
        assert np.allclose(waves[u][:n], ref[:n], atol=1.0)


def test_lexicon_file_roundtrip(tmp_path):
    lex = synthetic.digits_lexicon()
    path = str(tmp_path / "lexicon.txt")
    write_lexicon_file(path, lex)
    lex2 = read_lexicon_file(path)
    assert lex2.entries == lex.entries
    assert lex2.phones == lex.phones


def test_lexiconp_roundtrip_preserves_probs(tmp_path):
    path = str(tmp_path / "lexiconp.txt")
    with open(path, "w") as f:
        f.write("abc 1.0 a b\nabc 0.4 a c\nd 0.9 d\n")
    lex = read_lexicon_file(path)
    assert lex.entries["abc"] == [(["a", "b"], 1.0), (["a", "c"], 0.4)]
    assert lex.entries["d"] == [(["d"], 0.9)]
    out = str(tmp_path / "out.txt")
    write_lexicon_file(out, lex)
    lex2 = read_lexicon_file(out)
    assert lex2.entries == lex.entries


def test_numeric_phone_symbols_not_eaten_as_probs(tmp_path):
    # tone-phone style lexicons: first pronunciation token parses as a
    # float but is a phone; must not be misread as a lexiconp prob
    path = str(tmp_path / "lexicon.txt")
    with open(path, "w") as f:
        f.write("ma 1 a\nma 2 a\nba b a\n")
    lex = read_lexicon_file(path)
    assert lex.entries["ma"] == [(["1", "a"], 1.0), (["2", "a"], 1.0)]
    assert lex.entries["ba"] == [(["b", "a"], 1.0)]


def test_fix_drops_segments_with_missing_recording(tmp_path):
    corpus, _ = _tiny_corpus(n=2)
    utts = sorted(corpus.waves)
    from kaldi_cnn_tpu.io.wave import write_wave
    wav_path = str(tmp_path / "reco1.wav")
    write_wave(wav_path, corpus.waves[utts[0]], corpus.sample_rate)
    dd = DataDir(
        path=str(tmp_path),
        wav_scp={"reco1": wav_path},
        text={u: corpus.transcripts[u] for u in utts},
        utt2spk={u: "spk0" for u in utts},
        segments={utts[0]: Segment("reco1", 0.0, -1.0),
                  utts[1]: Segment("reco_missing", 0.0, -1.0)})
    issues = dd.validate(fix=True)
    assert issues
    # the orphaned segment (and its text/utt2spk rows) are gone, so
    # load_waves no longer KeyErrors on the missing recording
    assert utts[1] not in dd.utts()
    assert utts[1] not in dd.text and utts[1] not in dd.utt2spk
    waves, _ = dd.load_waves()
    assert set(waves) == {utts[0]}


def test_corpus_from_data_dir_runs_yesno(tmp_path):
    """VERDICT item 2 'done' criterion: a recipe runs end-to-end from an
    on-disk Kaldi data dir created by the test."""
    corpus, lex = _tiny_corpus(n=40, seed=11)
    write_data_dir(str(tmp_path), corpus.waves, corpus.transcripts,
                   None, corpus.sample_rate)
    write_lexicon_file(str(tmp_path / "lexicon.txt"), lex)
    loaded = corpus_from_data_dir(str(tmp_path))
    assert loaded.transcripts == corpus.transcripts
    from kaldi_cnn_tpu.recipes import yesno
    res = yesno.run(num_iters=12, totgauss=200, corpus=loaded)
    assert res["wer"] <= 20.0


@pytest.mark.slow
def test_wsj_trains_from_external_ark_alignments(tmp_path):
    """Differential-interop path: alignments supplied via an ark file
    (as the reference's steps/align_*.sh would produce) drive egs
    generation instead of the in-recipe bootstrap."""
    from kaldi_cnn_tpu.gmm.train import MonoTrainOptions, train_mono
    from kaldi_cnn_tpu.io.kaldi_io import write_ark
    from kaldi_cnn_tpu.lang.hclg import Lang
    from kaldi_cnn_tpu.recipes import wsj
    from kaldi_cnn_tpu.recipes.yesno import compute_features

    lex = synthetic.digits_lexicon()
    wp = {w: 1.0 / len(lex.entries) for w in lex.entries}
    corpus = synthetic.make_corpus(lex, wp, 40, 2, 5, seed=67)
    # produce alignments externally (stand-in for the reference's ali
    # ark; same transition-id convention via the deterministic
    # tri-from-seed bootstrap inside wsj.run)
    res_base = wsj.run(num_utts=40, nnet_epochs=2, num_filters=16,
                       seed=67, corpus=corpus)
    # now rerun supplying alignments through the ark round-trip: build
    # them with the same bootstrap, dump to ark, reload as "external"
    traindev, _ = corpus.split(0.2)
    train, _ = traindev.split(0.15)
    mfcc = compute_features(train, seed=67)
    lang = Lang.create(lex)
    _, ali0 = train_mono(mfcc, train.transcripts, lang,
                         MonoTrainOptions(num_iters=18, totgauss=300))
    from kaldi_cnn_tpu.gmm.train import DeltasTrainOptions, train_deltas
    _, ali1, _ = train_deltas(
        mfcc, train.transcripts, lang, ali0, lang.trans_model,
        DeltasTrainOptions(num_iters=12, totgauss=700, max_leaves=250))
    ark = str(tmp_path / "ali.ark")
    write_ark(ark, {u: np.asarray(a, np.int32) for u, a in ali1.items()})
    ext = load_alignments_ark(ark)
    assert sorted(ext) == sorted(ali1)
    res = wsj.run(num_utts=40, nnet_epochs=2, num_filters=16, seed=67,
                  corpus=corpus, ext_alignments=ext)
    assert 0.0 <= res["wer"] <= 100.0
    # identical seed + identical alignments => identical egs => same WER
    assert res["wer"] == res_base["wer"]
