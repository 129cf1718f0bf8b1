"""CLI multitool smoke tests (ref: every binary's --help + piping
contract)."""

import os

import numpy as np
import pytest

from kaldi_cnn_tpu import cli
from kaldi_cnn_tpu.io.kaldi_io import read_mat_ark, write_ark
from kaldi_cnn_tpu.io.wave import write_wave


def test_help_lists_verbs(capsys):
    assert cli.main([]) == 0
    out = capsys.readouterr().out
    assert "compute-mfcc-feats" in out
    assert cli.main(["no-such-verb"]) == 2


def test_feature_pipeline_verbs(tmp_path, rng):
    wav = tmp_path / "a.wav"
    write_wave(str(wav), (rng.normal(size=8000) * 1000).astype(np.int16),
               8000.0)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt1 {wav}\n")
    mfcc_ark = str(tmp_path / "mfcc.ark")
    assert cli.main(["compute-mfcc-feats", "--dither=0",
                     str(scp), mfcc_ark]) == 0
    feats = dict(read_mat_ark(mfcc_ark))
    assert feats["utt1"].shape[1] == 13
    delta_ark = str(tmp_path / "delta.ark")
    assert cli.main(["add-deltas", mfcc_ark, delta_ark]) == 0
    d = dict(read_mat_ark(delta_ark))
    assert d["utt1"].shape[1] == 39
    cmvn_ark = str(tmp_path / "cmvn.ark")
    assert cli.main(["apply-cmvn", delta_ark, cmvn_ark]) == 0
    c = dict(read_mat_ark(cmvn_ark))
    assert np.abs(c["utt1"].mean(axis=0)).max() < 1e-3
    spliced_ark = str(tmp_path / "spliced.ark")
    assert cli.main(["splice-feats", "--left-context=2",
                     "--right-context=2", cmvn_ark, spliced_ark]) == 0
    s = dict(read_mat_ark(spliced_ark))
    assert s["utt1"].shape[1] == 39 * 5


def test_compute_wer(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("u1 yes no\nu2 no\n")
    (tmp_path / "hyp.txt").write_text("u1 yes yes\nu2 no\n")
    assert cli.main(["compute-wer", str(tmp_path / "ref.txt"),
                     str(tmp_path / "hyp.txt")]) == 0
    out = capsys.readouterr().out
    assert "%WER 33.33" in out


@pytest.fixture(scope="module")
def lat_npz(tmp_path_factory):
    from kaldi_cnn_tpu.decode.lattice import Lattice, save_lattices
    lat = Lattice(
        num_states=4, start=0,
        state_time=np.asarray([0, 1, 1, 2], np.int32),
        arc_src=np.asarray([0, 0, 1, 2], np.int32),
        arc_dst=np.asarray([1, 2, 3, 3], np.int32),
        arc_ilabel=np.asarray([5, 6, 7, 7], np.int32),
        arc_olabel=np.asarray([1, 2, 0, 0], np.int32),
        arc_graph=np.asarray([1.0, 2.0, 0.5, 0.5], np.float32),
        arc_acoustic=np.asarray([3.0, 1.5, 1.0, 1.0], np.float32),
        final_graph=np.asarray([np.inf, np.inf, np.inf, 0.25], np.float32))
    d = tmp_path_factory.mktemp("lat")
    path = str(d / "lat.npz")
    save_lattices(path, {"utt1": lat})
    words = d / "words.txt"
    words.write_text("<eps> 0\nyes 1\nno 2\n")
    return path, str(words), str(d)


def test_lattice_verbs(lat_npz, capsys):
    path, words, d = lat_npz
    assert cli.main(["lattice-best-path", "--word-table", words,
                     path]) == 0
    assert capsys.readouterr().out.strip() == "utt1 no"
    assert cli.main(["lattice-nbest", "--n=2", path]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["utt1-1 2", "utt1-2 1"]
    assert cli.main(["lattice-mbr-decode", path]) == 0
    capsys.readouterr()
    out2 = os.path.join(d, "out.npz")
    for verb in ("lattice-prune", "lattice-push", "lattice-minimize",
                 "lattice-determinize"):
        assert cli.main([verb, path, out2]) == 0
    assert cli.main(["lattice-scale", "--acoustic-scale=0.5",
                     path, out2]) == 0
    from kaldi_cnn_tpu.decode.lattice import load_lattices
    scaled = load_lattices(out2)["utt1"]
    np.testing.assert_allclose(scaled.arc_acoustic,
                               [1.5, 0.75, 0.5, 0.5])
    assert cli.main(["lattice-to-post", path]) == 0
    post = capsys.readouterr().out
    assert post.startswith("utt1 [") and "]" in post
    assert cli.main(["lattice-copy", path]) == 0
    capsys.readouterr()


def test_lattice_lmrescore_verb(lat_npz, tmp_path, capsys):
    path, words, d = lat_npz
    from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(make_unigram_arpa({"yes": 0.999, "no": 0.001}))
    out = str(tmp_path / "rescored.npz")
    assert cli.main(["lattice-lmrescore", "--scale=4.0", "--word-table",
                     words, str(arpa), path, out]) == 0
    assert cli.main(["lattice-best-path", "--word-table", words,
                     out]) == 0
    assert capsys.readouterr().out.strip() == "utt1 yes"


@pytest.fixture(scope="module")
def small_mdl(tmp_path_factory):
    import jax
    from kaldi_cnn_tpu.io.kaldi_model import write_am_nnet
    from kaldi_cnn_tpu.lang.topology import HmmTopology
    from kaldi_cnn_tpu.lang.transition_model import (
        MonophoneContextDependency, TransitionModel)
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
    cfg = ConvnetConfig(
        in_t=6, in_f=12, in_c=1, filt_t=3, filt_f=5, num_filters=8,
        pool_t=2, pool_f=2, pool_c=1, num_hidden_layers=1,
        pnorm_input_dim=32, pnorm_output_dim=8, num_pdfs=9)
    net = make_convnet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    topo = HmmTopology([1, 2, 3])
    tm = TransitionModel(topo, MonophoneContextDependency(topo))
    path = str(tmp_path_factory.mktemp("mdl") / "final.mdl")
    write_am_nnet(path, tm, net, params)
    return path


def test_nnet_am_verbs(small_mdl, tmp_path, capsys):
    assert cli.main(["nnet-am-info", small_mdl]) == 0
    out = capsys.readouterr().out
    assert "num-pdfs 9" in out and "Conv2DComponent" in out
    copied = str(tmp_path / "copy.mdl")
    assert cli.main(["nnet-am-copy", small_mdl, copied]) == 0
    assert open(copied, "rb").read() == open(small_mdl, "rb").read()
    avg = str(tmp_path / "avg.mdl")
    assert cli.main(["nnet-am-average", small_mdl, copied, avg]) == 0
    assert open(avg, "rb").read() == open(small_mdl, "rb").read()


def test_gmm_info_and_ali_to_pdf(tmp_path, capsys):
    from kaldi_cnn_tpu.gmm.am_gmm import AmDiagGmm
    from kaldi_cnn_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_cnn_tpu.io.kaldi_io import write_ark, read_ark
    from kaldi_cnn_tpu.io.kaldi_model import write_gmm_model
    from kaldi_cnn_tpu.lang.topology import HmmTopology
    from kaldi_cnn_tpu.lang.transition_model import (
        MonophoneContextDependency, TransitionModel)
    rng = np.random.default_rng(0)
    topo = HmmTopology([1, 2])
    tm = TransitionModel(topo, MonophoneContextDependency(topo))
    gmms = [DiagGmm(np.ones(2) / 2, rng.normal(size=(2, 4)),
                    np.ones((2, 4))) for _ in range(tm.num_pdfs)]
    mdl = str(tmp_path / "g.mdl")
    write_gmm_model(mdl, tm, AmDiagGmm(gmms))
    assert cli.main(["gmm-info", mdl]) == 0
    out = capsys.readouterr().out
    assert f"number of pdfs {tm.num_pdfs}" in out
    ali_ark = str(tmp_path / "ali.ark")
    tids = [1, 1, 2, 3]
    write_ark(ali_ark, {"utt1": np.asarray(tids, np.int32)})
    out_ark = str(tmp_path / "pdf.ark")
    assert cli.main(["ali-to-pdf", mdl, ali_ark, out_ark]) == 0
    pdfs = dict(read_ark(out_ark))["utt1"]
    want = [tm.id_to_pdf(t) for t in tids]
    assert list(pdfs) == want


def test_arpa2fst_verb(tmp_path, capsys):
    from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
    from kaldi_cnn_tpu.lang.fst import Fst
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(make_unigram_arpa({"yes": 0.5, "no": 0.5}))
    words = tmp_path / "words.txt"
    words.write_text("<eps> 0\nyes 1\nno 2\n")
    out = str(tmp_path / "g.fst.txt")
    assert cli.main(["arpa2fst", str(arpa), str(words), out]) == 0
    g = Fst.read_text(open(out))
    assert g.num_states >= 1 and g.num_arcs >= 2


def test_cmvn_stats_verbs(tmp_path, rng):
    from kaldi_cnn_tpu.io.kaldi_io import write_ark
    feats = {"u1": rng.normal(1.5, 2.0, size=(30, 4)).astype(np.float32),
             "u2": rng.normal(-1.0, 0.5, size=(20, 4)).astype(np.float32)}
    in_ark = str(tmp_path / "f.ark")
    write_ark(in_ark, feats)
    spk2utt = tmp_path / "spk2utt"
    spk2utt.write_text("spkA u1 u2\n")
    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("u1 spkA\nu2 spkA\n")
    cmvn_ark = str(tmp_path / "cmvn.ark")
    assert cli.main(["compute-cmvn-stats", "--spk2utt", str(spk2utt),
                     in_ark, cmvn_ark]) == 0
    out_ark = str(tmp_path / "norm.ark")
    assert cli.main(["apply-cmvn-stats", "--utt2spk", str(utt2spk),
                     "--norm-vars", cmvn_ark, in_ark, out_ark]) == 0
    normed = dict(read_mat_ark(out_ark))
    # pooled over the speaker, the normalized stream is ~N(0, 1)
    pooled = np.concatenate([normed["u1"], normed["u2"]])
    assert np.abs(pooled.mean(axis=0)).max() < 1e-4
    assert np.abs(pooled.std(axis=0) - 1.0).max() < 1e-3
    # per-speaker stats shift both utts by the SAME mean: per-utt means
    # differ from zero
    assert np.abs(normed["u1"].mean(axis=0)).max() > 0.1


def test_pitch_verbs(tmp_path):
    """compute-kaldi-pitch-feats | process-kaldi-pitch-feats pipe
    (ref: featbin compute/process-kaldi-pitch-feats)."""
    sr = 8000
    t = np.arange(sr) / sr
    wave = (np.sin(2 * np.pi * 150 * t) * 8000).astype(np.int16)
    wav = tmp_path / "p.wav"
    write_wave(str(wav), wave, float(sr))
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt1 {wav}\n")
    raw_ark = str(tmp_path / "pitch.ark")
    assert cli.main(["compute-kaldi-pitch-feats", str(scp),
                     raw_ark]) == 0
    raw = dict(read_mat_ark(raw_ark))["utt1"]
    assert raw.shape[1] == 2
    # a clean 150 Hz tone: pitch within 10% on interior frames
    assert np.abs(raw[5:-5, 1] - 150.0).max() < 15.0
    proc_ark = str(tmp_path / "pitchp.ark")
    assert cli.main(["process-kaldi-pitch-feats", raw_ark,
                     proc_ark]) == 0
    proc = dict(read_mat_ark(proc_ark))["utt1"]
    assert proc.shape == (raw.shape[0], 3)
    assert np.isfinite(proc).all()
