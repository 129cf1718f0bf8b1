"""Round-trip tests for the Kaldi binary .mdl model format
(ref pattern: transition-model-test.cc + nnet2 component Read/Write
checks in nnet-component-test.cc)."""

import numpy as np
import pytest

from kaldi_cnn_tpu.gmm.am_gmm import AmDiagGmm
from kaldi_cnn_tpu.gmm.diag_gmm import DiagGmm
from kaldi_cnn_tpu.io.kaldi_model import (
    read_am_nnet, read_gmm_model, write_am_nnet, write_gmm_model)
from kaldi_cnn_tpu.lang.topology import HmmTopology
from kaldi_cnn_tpu.lang.transition_model import (
    MonophoneContextDependency, TransitionModel)


def make_tm():
    topo = HmmTopology([1, 2, 3])
    return TransitionModel(topo, MonophoneContextDependency(topo))


def test_am_nnet_mdl_roundtrip(tmp_path):
    import jax
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
    cfg = ConvnetConfig(
        in_t=6, in_f=12, in_c=1, filt_t=3, filt_f=5, num_filters=8,
        pool_t=2, pool_f=2, pool_c=1, num_hidden_layers=1,
        pnorm_input_dim=32, pnorm_output_dim=8, num_pdfs=9)
    net = make_convnet(cfg)
    params = net.init(jax.random.PRNGKey(3))
    tm = make_tm()
    priors = np.random.default_rng(0).dirichlet(np.ones(9)).astype(
        np.float32)
    path = str(tmp_path / "final.mdl")
    write_am_nnet(path, tm, net, params, priors)

    tm2, net2, params2, priors2 = read_am_nnet(path)
    assert [type(c).__name__ for c in net2.components] == \
        [type(c).__name__ for c in net.components]
    np.testing.assert_allclose(priors2, priors)
    assert tm2.tuples == tm.tuples
    np.testing.assert_allclose(tm2.log_probs, tm.log_probs, atol=1e-6)
    x = np.random.default_rng(1).normal(
        size=(4, net.input_dim)).astype(np.float32)
    y1 = np.asarray(net.predict(params, x))
    y2 = np.asarray(net2.predict(params2, x))
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_am_nnet_double_roundtrip_is_identical(tmp_path):
    """write(read(write(m))) must be byte-identical — the format is
    self-consistent."""
    import jax
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
    cfg = ConvnetConfig(
        in_t=6, in_f=12, in_c=1, filt_t=3, filt_f=5, num_filters=8,
        pool_t=2, pool_f=2, pool_c=1, num_hidden_layers=1,
        pnorm_input_dim=32, pnorm_output_dim=8, num_pdfs=9)
    net = make_convnet(cfg)
    params = net.init(jax.random.PRNGKey(3))
    p1 = str(tmp_path / "a.mdl")
    p2 = str(tmp_path / "b.mdl")
    write_am_nnet(p1, make_tm(), net, params)
    tm2, net2, params2, priors2 = read_am_nnet(p1)
    write_am_nnet(p2, tm2, net2, params2, priors2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_gmm_mdl_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    tm = make_tm()
    gmms = []
    for _ in range(tm.num_pdfs):
        w = rng.dirichlet(np.ones(3))
        gmms.append(DiagGmm(w, rng.normal(size=(3, 5)),
                            rng.uniform(0.5, 2.0, size=(3, 5))))
    am = AmDiagGmm(gmms)
    path = str(tmp_path / "final.mdl")
    write_gmm_model(path, tm, am)
    tm2, am2 = read_gmm_model(path)
    assert tm2.tuples == tm.tuples
    x = rng.normal(size=(6, 5))
    for g1, g2 in zip(am.gmms, am2.gmms):
        np.testing.assert_allclose(g1.loglikes(x), g2.loglikes(x),
                                   atol=1e-4)
