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
