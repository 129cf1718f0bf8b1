"""get-feature-transform / mixup / nnet-fix tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_cnn_tpu.models.components import (
    AffineComponent, RectifiedLinearComponent, SoftmaxComponent,
    TanhComponent)
from kaldi_cnn_tpu.models.nnet import Nnet
from kaldi_cnn_tpu.models.utils import (
    SumGroupComponent, estimate_feature_transform, fix_nnet, mixup_nnet)


def test_sum_group_component(rng):
    c = SumGroupComponent(sizes=(2, 3, 1))
    x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    y, _ = c.forward({}, x)
    assert y.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(y)[:, 0],
                               np.asarray(x)[:, :2].sum(1), rtol=1e-5)
    # backprop broadcasts
    d = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    dx = c.backprop({}, x, y, d, None)
    np.testing.assert_allclose(np.asarray(dx)[:, 0], np.asarray(d)[:, 0])
    np.testing.assert_allclose(np.asarray(dx)[:, 2], np.asarray(d)[:, 1])


def test_estimate_feature_transform(rng):
    centers = rng.normal(size=(5, 12)).astype(np.float32) * 3
    y = rng.integers(0, 5, 600)
    x = (centers[y] + rng.normal(size=(600, 12))).astype(np.float32)
    ft = estimate_feature_transform(x, y)
    p = ft.init(jax.random.PRNGKey(0))
    out, _ = ft.forward(p, jnp.asarray(x))
    assert out.shape[1] == 12
    # within-class variance strongly shrunk relative to total
    out = np.asarray(out)
    total_var = out.var(axis=0).mean()
    within = np.mean([out[y == c].var(axis=0).mean() for c in range(5)])
    assert within < 0.3 * total_var


def test_mixup_preserves_posteriors_then_trains(rng):
    net = Nnet([
        AffineComponent(input_dim=10, output_dim=20),
        TanhComponent(dim=20),
        AffineComponent(input_dim=20, output_dim=6, param_stddev=0.0),
        SoftmaxComponent(dim=6),
    ])
    params = net.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.normal(size=(32, 10)).astype(np.float32))
    before = np.asarray(net.predict(params, x))
    net2, params2 = mixup_nnet(net, params, target_components=18,
                               perturb=0.0)
    after = np.asarray(net2.predict(params2, x))
    assert after.shape == before.shape
    np.testing.assert_allclose(after, before, atol=1e-4)
    # and it still trains
    opt2 = net2.init_opt()
    y = rng.integers(0, 6, 32).astype(np.int32)
    o0 = float(net2.objf(params2, x, jnp.asarray(y)))
    p, o = params2, opt2
    for s in range(20):
        p, o, objf = net2.train_step(p, o, x, jnp.asarray(y), 0.1)
    assert float(net2.objf(p, x, jnp.asarray(y))) > o0 + 0.1


def test_fix_nnet_rescales_saturated(rng):
    net = Nnet([
        AffineComponent(input_dim=8, output_dim=10),
        TanhComponent(dim=10),
        AffineComponent(input_dim=10, output_dim=4, param_stddev=0.0),
        SoftmaxComponent(dim=4),
    ])
    params = list(net.init(jax.random.PRNGKey(0)))
    # blow up the first affine so tanh saturates
    params[0] = {"w": params[0]["w"] * 100.0, "b": params[0]["b"]}
    params = tuple(params)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    fixed = fix_nnet(net, params, x)
    # weights shrank for saturated units
    w0 = np.abs(np.asarray(params[0]["w"])).mean()
    w1 = np.abs(np.asarray(fixed[0]["w"])).mean()
    assert w1 < w0
