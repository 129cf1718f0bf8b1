"""Recipe smoke tests at miniature scale (the RESULTS-file regression
idea of SURVEY.md §4, scaled to CI): each flagship recipe must run its
full pipeline end to end and produce a sane WER dict."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_rm_recipe_smoke():
    from kaldi_cnn_tpu.recipes import rm
    res = rm.run(num_utts=48, nnet_epochs=6, seed=61)
    assert res["words"] > 10
    assert 0.0 <= res["wer"] <= 100.0
    assert "gmm_test_wer" in res and "dnn_dev_wer" in res


def test_wsj_cnn_recipe_smoke():
    from kaldi_cnn_tpu.recipes import wsj
    res = wsj.run(num_utts=40, nnet_epochs=6, num_filters=16, seed=67)
    assert res["words"] > 10
    assert 0.0 <= res["wer"] <= 100.0
    assert res["train_audio_ss"] > 0


def test_librispeech_mesh_recipe_smoke():
    from kaldi_cnn_tpu.recipes import librispeech
    res = librispeech.run(num_utts=36, nnet_epochs=5, num_filters=16,
                          average_every=8, seed=71)
    assert res["words"] > 10
    assert 0.0 <= res["wer"] <= 100.0
    assert res["num_devices"] >= 8  # virtual CPU mesh from conftest
