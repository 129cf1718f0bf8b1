"""Table I/O + wave round-trip tests
(style: the reference's util/kaldi-table-test.cc / feat wave tests)."""

import numpy as np

from kaldi_cnn_tpu.io import (
    ArkWriter, read_ark, read_scp, read_wave, write_ark, write_wave)


def test_wave_roundtrip(tmp_path, rng):
    x = (rng.normal(0, 1000, 8000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wave(p, x, 16000)
    y, rate = read_wave(p)
    assert rate == 16000
    assert y.shape == (1, 8000)
    np.testing.assert_allclose(y[0], np.round(x), atol=0.51)


def test_ark_matrix_roundtrip(tmp_path, rng):
    data = {
        "utt1": rng.normal(size=(17, 13)).astype(np.float32),
        "utt2": rng.normal(size=(5, 40)).astype(np.float32),
    }
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark(ark, data, scp)
    got = dict(read_ark(f"ark:{ark}".split(":", 1)[1]))
    assert set(got) == {"utt1", "utt2"}
    for k in data:
        np.testing.assert_array_equal(got[k], data[k])
    # random access via scp with byte offsets
    got_scp = dict(read_scp(scp))
    for k in data:
        np.testing.assert_array_equal(got_scp[k], data[k])


def test_ark_vector_and_int_roundtrip(tmp_path, rng):
    vec = rng.normal(size=64).astype(np.float32)
    ali = rng.integers(0, 100, size=37).astype(np.int32)
    ark = str(tmp_path / "mix.ark")
    with ArkWriter(ark) as w:
        w.write("v", vec)
        w.write("a", ali)
    got = dict(read_ark(ark))
    np.testing.assert_array_equal(got["v"], vec)
    np.testing.assert_array_equal(got["a"], ali)
    assert got["a"].dtype == np.int32


def test_ark_double_matrix(tmp_path, rng):
    m = rng.normal(size=(3, 4))  # float64
    ark = str(tmp_path / "d.ark")
    write_ark(ark, {"m": m})
    got = dict(read_ark(ark))["m"]
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, m)


def test_pipe_rxfilename(tmp_path, rng):
    data = {"u": rng.normal(size=(4, 4)).astype(np.float32)}
    ark = str(tmp_path / "p.ark")
    write_ark(ark, data)
    got = dict(read_ark(f"cat {ark} |"))
    np.testing.assert_array_equal(got["u"], data["u"])
