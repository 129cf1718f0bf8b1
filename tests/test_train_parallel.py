"""Trainer + data-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4: 'distributed testing without a cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_cnn_tpu.core.mesh import make_mesh
from kaldi_cnn_tpu.models.components import (
    AffineComponent, NormalizeComponent, PnormComponent, SoftmaxComponent)
from kaldi_cnn_tpu.models.nnet import Nnet
from kaldi_cnn_tpu.parallel.dp import average_params, make_dp_step
from kaldi_cnn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from kaldi_cnn_tpu.train.egs import Egs, EgsBatcher, EgsConfig, make_egs
from kaldi_cnn_tpu.train.trainer import TrainConfig, lr_at, train_nnet


def _net(input_dim=12, classes=4):
    return Nnet([
        AffineComponent(input_dim=input_dim, output_dim=32),
        PnormComponent(input_dim=32, output_dim=8),
        NormalizeComponent(dim=8),
        AffineComponent(input_dim=8, output_dim=classes, param_stddev=0.0),
        SoftmaxComponent(dim=classes),
    ], ng_update_period=2)


_CENTERS = {}


def _egs(rng, n=768, input_dim=12, classes=4):
    # class centers fixed per (input_dim, classes) so train and valid
    # sets are drawn from the SAME distribution
    key = (input_dim, classes)
    if key not in _CENTERS:
        _CENTERS[key] = np.random.default_rng(99).normal(
            size=(classes, input_dim)).astype(np.float32) * 2
    centers = _CENTERS[key]
    y = rng.integers(0, classes, n).astype(np.int32)
    x = (centers[y] + rng.normal(size=(n, input_dim))).astype(np.float32)
    return Egs(x, y, np.ones(n, np.float32))


def test_make_egs_splicing(rng):
    feats = {"u1": rng.normal(size=(10, 3)).astype(np.float32)}
    ali = {"u1": np.arange(10).astype(np.int32) % 4 + 1}
    tid2pdf = np.arange(10, dtype=np.int32)  # tid==pdf map for test
    egs = make_egs(feats, ali, tid2pdf, EgsConfig(left_context=2,
                                                  right_context=1))
    assert egs.x.shape == (10, 12)
    assert set(egs.y) <= {1, 2, 3, 4}


def test_batcher_pads_and_weights():
    egs = Egs(np.zeros((10, 3), np.float32),
              np.zeros(10, np.int32), np.ones(10, np.float32))
    b = EgsBatcher(egs, minibatch_size=4, seed=0)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    x, y, w = batches[-1]
    assert x.shape == (4, 3)
    assert w.sum() == 2.0  # 10 = 4+4+2


def test_lr_schedule():
    cfg = TrainConfig(initial_learning_rate=0.04, final_learning_rate=0.004)
    assert lr_at(cfg, 0.0) == pytest.approx(0.04)
    assert lr_at(cfg, 1.0) == pytest.approx(0.004)
    assert lr_at(cfg, 0.5) == pytest.approx(np.sqrt(0.04 * 0.004))


def test_train_nnet_end_to_end(rng, tmp_path):
    net = _net()
    train = _egs(rng, n=768)
    valid = _egs(rng, n=128)
    cfg = TrainConfig(num_epochs=15, minibatch_size=128,
                      initial_learning_rate=0.15,
                      final_learning_rate=0.03,
                      checkpoint_dir=str(tmp_path))
    params, opt = train_nnet(net, train, valid, cfg)
    objf = float(net.objf(params, jnp.asarray(valid.x),
                          jnp.asarray(valid.y)))
    assert objf > np.log(0.4)
    assert (tmp_path / "final.npz").exists()


def test_checkpoint_roundtrip(rng):
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        save_checkpoint(p, params, opt, {"it": 3})
        p2, o2, meta = load_checkpoint(p, params, opt)
        assert meta["it"] == 3
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_step_matches_single_device(rng):
    """Sharded global batch == single-device batch (same math, psum
    inserted by GSPMD)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    x = rng.normal(size=(256, 12)).astype(np.float32)
    y = rng.integers(0, 4, 256).astype(np.int32)
    dp_step = make_dp_step(net, mesh)
    p1, o1, objf1 = dp_step(params, opt, x, y, 0.05)
    p2, o2, objf2 = net.train_step(params, opt, jnp.asarray(x),
                                   jnp.asarray(y), 0.05)
    assert float(objf1) == pytest.approx(float(objf2), abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_training_improves(rng):
    mesh = make_mesh()
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    egs = _egs(rng, n=512)
    dp_step = make_dp_step(net, mesh)
    objf0 = float(net.objf(params, jnp.asarray(egs.x), jnp.asarray(egs.y)))
    for s in range(50):
        params, opt, objf = dp_step(params, opt, egs.x, egs.y, 0.1,
                                    key=np.array([0, s], np.uint32))
        # Sync each step: with 8 virtual devices on a 2-core CI host,
        # queueing many cross-module all-reduces ahead of execution can
        # starve XLA:CPU's 40 s collective rendezvous (observed SIGABRT
        # in rendezvous.cc).  One in-flight step at a time is robust.
        jax.block_until_ready(objf)
    objf1 = float(net.objf(params, jnp.asarray(egs.x), jnp.asarray(egs.y)))
    assert objf1 > objf0 + 0.5


def test_average_params():
    a = ({"w": jnp.ones((2, 2))},)
    b = ({"w": jnp.zeros((2, 2))},)
    avg = average_params([a, b])
    np.testing.assert_allclose(np.asarray(avg[0]["w"]), 0.5)
