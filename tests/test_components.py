"""Component gradient checks: numeric vs analytic Backprop, the
reference's nnet2/nnet-component-test.cc pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_cnn_tpu.models.components import (
    AffineComponent, Conv2DComponent, DropoutComponent,
    FixedAffineComponent, Maxpooling3DComponent, NormalizeComponent,
    PnormComponent, RectifiedLinearComponent, SigmoidComponent,
    SoftmaxComponent, SpliceComponent, TanhComponent)


def check_backprop(comp, params, x, rng, eps=1e-3, tol=2e-2, aux=None):
    """Numeric-vs-analytic: f(x) = sum(forward(x) * R)."""
    y, aux_out = comp.forward(params, jnp.asarray(x), train=False)
    if aux is None:
        aux = aux_out
    r = rng.normal(size=y.shape).astype(np.float32)
    in_deriv = np.asarray(
        comp.backprop(params, jnp.asarray(x), y, jnp.asarray(r), aux))
    # numeric derivative along a few random directions
    for _ in range(4):
        d = rng.normal(size=x.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        yp, _ = comp.forward(params, jnp.asarray(x + eps * d), train=False)
        ym, _ = comp.forward(params, jnp.asarray(x - eps * d), train=False)
        num = float(np.sum((np.asarray(yp) - np.asarray(ym)) * r)) / (2 * eps)
        ana = float(np.sum(in_deriv * d))
        assert num == pytest.approx(ana, rel=tol, abs=tol), type(comp).__name__


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_affine_backprop(rng, key):
    c = AffineComponent(input_dim=7, output_dim=5)
    p = c.init(key)
    x = rng.normal(size=(6, 7)).astype(np.float32)
    check_backprop(c, p, x, rng)


def test_fixed_affine_backprop(rng, key):
    mat = rng.normal(size=(4, 6)).astype(np.float32)
    c = FixedAffineComponent.from_matrix(mat)
    p = c.init(key)
    x = rng.normal(size=(5, 6)).astype(np.float32)
    check_backprop(c, p, x, rng)


@pytest.mark.parametrize("cls", [TanhComponent, SigmoidComponent])
def test_smooth_nonlin_backprop(rng, key, cls):
    c = cls(dim=9)
    x = rng.normal(size=(5, 9)).astype(np.float32)
    check_backprop(c, {}, x, rng)


def test_relu_backprop(rng, key):
    c = RectifiedLinearComponent(dim=9)
    x = rng.normal(size=(5, 9)).astype(np.float32)
    x[np.abs(x) < 0.05] += 0.2  # keep away from the kink
    check_backprop(c, {}, x, rng)


def test_pnorm_backprop(rng, key):
    c = PnormComponent(input_dim=12, output_dim=4, p=2.0)
    x = rng.normal(size=(5, 12)).astype(np.float32) + 0.1
    check_backprop(c, {}, x, rng)


def test_pnorm_forward_values(rng):
    c = PnormComponent(input_dim=4, output_dim=2, p=2.0)
    x = jnp.asarray([[3.0, 4.0, 0.0, 1.0]])
    y, _ = c.forward({}, x)
    np.testing.assert_allclose(np.asarray(y), [[5.0, 1.0]], atol=1e-5)


def test_normalize_backprop(rng, key):
    c = NormalizeComponent(dim=8)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    check_backprop(c, {}, x, rng)
    y, _ = c.forward({}, jnp.asarray(x))
    rms = np.sqrt((np.asarray(y) ** 2).mean(axis=1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-4)


def test_softmax_backprop(rng, key):
    c = SoftmaxComponent(dim=6)
    x = rng.normal(size=(5, 6)).astype(np.float32)
    check_backprop(c, {}, x, rng)
    y, _ = c.forward({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y).sum(axis=1), 1.0, atol=1e-5)


def test_dropout_backprop_uses_mask(rng, key):
    c = DropoutComponent(dim=10, proportion=0.5)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    y, mask = c.forward({}, jnp.asarray(x), train=True, key=key)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x * mask), atol=1e-6)
    # eval mode: identity
    y2, _ = c.forward({}, jnp.asarray(x), train=False)
    np.testing.assert_array_equal(np.asarray(y2), x)


def test_splice_component(rng):
    c = SpliceComponent(input_dim=3, left_context=2, right_context=1)
    x = rng.normal(size=(6, 3)).astype(np.float32)
    y, _ = c.forward({}, jnp.asarray(x))
    assert y.shape == (6, 12)
    np.testing.assert_array_equal(np.asarray(y[3, :3]), x[1])
    np.testing.assert_array_equal(np.asarray(y[3, 9:]), x[4])


def test_splice_backprop(rng):
    # gradient-checked like every other component, so splice can sit
    # mid-network (ref: nnet-component.cc SpliceComponent::Backprop)
    c = SpliceComponent(input_dim=3, left_context=2, right_context=1)
    x = rng.normal(size=(6, 3)).astype(np.float32)
    check_backprop(c, {}, x, rng)


def test_conv2d_matches_lax_conv(rng, key):
    c = Conv2DComponent(in_t=8, in_f=10, in_c=2, filt_t=3, filt_f=4,
                        num_filters=5)
    p = c.init(key)
    x = rng.normal(size=(3, c.input_dim)).astype(np.float32)
    y, _ = c.forward(p, jnp.asarray(x))
    # cross-check against lax.conv_general_dilated
    xim = x.reshape(3, 8, 10, 2)
    w = np.asarray(p["w"]).reshape(5, 3, 4, 2).transpose(1, 2, 3, 0)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xim), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) + np.asarray(p["b"])
    got = np.asarray(y).reshape(3, c.out_t, c.out_f, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv2d_backprop(rng, key):
    c = Conv2DComponent(in_t=5, in_f=6, in_c=1, filt_t=2, filt_f=3,
                        num_filters=4)
    p = c.init(key)
    x = rng.normal(size=(3, c.input_dim)).astype(np.float32)
    check_backprop(c, p, x, rng)


def test_conv2d_stride(rng, key):
    c = Conv2DComponent(in_t=9, in_f=8, in_c=1, filt_t=3, filt_f=4,
                        num_filters=2, stride_t=2, stride_f=2)
    assert c.out_t == 4 and c.out_f == 3
    p = c.init(key)
    x = rng.normal(size=(2, c.input_dim)).astype(np.float32)
    y, _ = c.forward(p, jnp.asarray(x))
    assert y.shape == (2, c.output_dim)
    check_backprop(c, p, x, rng)


def test_maxpool3d_forward_and_backprop(rng, key):
    c = Maxpooling3DComponent(in_t=4, in_f=6, in_c=4, pool_t=2, pool_f=3,
                              pool_c=2)
    assert c.output_dim == 2 * 2 * 2
    x = rng.normal(size=(3, c.input_dim)).astype(np.float32)
    # perturb away from ties
    x += rng.uniform(0.0, 0.01, x.shape).astype(np.float32)
    y, _ = c.forward({}, jnp.asarray(x))
    v = x.reshape(3, 2, 2, 2, 3, 2, 2)
    np.testing.assert_allclose(np.asarray(y).reshape(3, 2, 2, 2),
                               v.max(axis=(2, 4, 6)), atol=1e-6)
    check_backprop(c, {}, x, rng)


def test_slice_parallel_backprop(rng, key):
    from kaldi_cnn_tpu.models.components import (
        IdentityComponent, SliceParallelComponent)
    conv = Conv2DComponent(in_t=4, in_f=6, in_c=1, filt_t=2, filt_f=3,
                           num_filters=3)
    c = SliceParallelComponent(parts=(conv, IdentityComponent(5)))
    p = c.init(key)
    assert c.input_dim == conv.input_dim + 5
    assert c.output_dim == conv.output_dim + 5
    x = rng.normal(size=(6, c.input_dim)).astype(np.float32)
    y, aux = c.forward(p, jnp.asarray(x))
    # identity branch passes through
    np.testing.assert_allclose(np.asarray(y)[:, -5:], x[:, -5:])
    check_backprop(c, p, x, rng)


def test_slice_parallel_update_trains(rng, key):
    from kaldi_cnn_tpu.models.components import (
        IdentityComponent, SliceParallelComponent)
    from kaldi_cnn_tpu.models.nnet import Nnet
    conv = Conv2DComponent(in_t=4, in_f=6, in_c=1, filt_t=2, filt_f=3,
                           num_filters=3)
    net = Nnet([
        SliceParallelComponent(parts=(conv, IdentityComponent(4))),
        AffineComponent(conv.output_dim + 4, 6, param_stddev=0.0),
        SoftmaxComponent(6),
    ])
    params = net.init(key)
    opt = net.init_opt()
    x = rng.normal(size=(64, net.input_dim)).astype(np.float32)
    y = rng.integers(0, 6, 64).astype(np.int32)
    o0 = float(net.objf(params, jnp.asarray(x), jnp.asarray(y)))
    for s in range(30):
        params, opt, objf = net.train_step(params, opt, jnp.asarray(x),
                                           jnp.asarray(y), 0.1)
    o1 = float(net.objf(params, jnp.asarray(x), jnp.asarray(y)))
    assert o1 > o0 + 0.2


def test_component_pickle_roundtrip(key):
    """Every component class and a full ivector-CNN Nnet must pickle:
    stage artifacts and model-object checkpoints rely on it (round-3
    VERDICT weak #5: an lru_cache wrapper on IdentityComponent broke
    pickling and isinstance)."""
    import pickle

    from kaldi_cnn_tpu.models.components import (IdentityComponent,
                                                 SliceParallelComponent)
    from kaldi_cnn_tpu.models.factory import make_convnet_ivector

    comps = [
        AffineComponent(input_dim=7, output_dim=5),
        FixedAffineComponent.from_matrix(
            np.eye(4, 6, dtype=np.float32)),
        TanhComponent(dim=3), SigmoidComponent(dim=3),
        RectifiedLinearComponent(dim=3),
        PnormComponent(input_dim=6, output_dim=3),
        NormalizeComponent(dim=3), SoftmaxComponent(dim=3),
        DropoutComponent(dim=3),
        SpliceComponent(input_dim=4, left_context=1, right_context=2),
        IdentityComponent(5),
        Conv2DComponent(in_t=4, in_f=6, in_c=1, filt_t=2, filt_f=3,
                        num_filters=3),
        Maxpooling3DComponent(in_t=3, in_f=4, in_c=3, pool_t=1,
                              pool_f=2, pool_c=1),
    ]
    comps.append(SliceParallelComponent(parts=(comps[-2], comps[-1])))
    for c in comps:
        c2 = pickle.loads(pickle.dumps(c))
        assert c2 == c, type(c).__name__
        assert isinstance(c2, type(c))

    # IdentityComponent must be a real class again
    ic = IdentityComponent(5)
    assert isinstance(ic, IdentityComponent)
    assert type(ic).__name__ == "IdentityComponent"

    # full ivector-CNN Nnet object round-trips
    net = make_convnet_ivector()
    net2 = pickle.loads(pickle.dumps(net))
    assert [type(c).__name__ for c in net2.components] == \
        [type(c).__name__ for c in net.components]
    assert net2.input_dim == net.input_dim
    assert net2.output_dim == net.output_dim


def test_maxpool3d_train_aux_matches_mask_path(rng):
    """The train path stores the argmax window index as aux and
    backprops by scattering along it; on tie-free input this must
    equal the aux-free v==y mask path exactly, and must satisfy the
    numeric gradient check."""
    c = Maxpooling3DComponent(in_t=4, in_f=6, in_c=4, pool_t=2,
                              pool_f=3, pool_c=2)
    x = rng.normal(size=(3, c.input_dim)).astype(np.float32)
    x += rng.uniform(0.0, 0.01, x.shape).astype(np.float32)
    y_tr, aux = c.forward({}, jnp.asarray(x), train=True)
    y_inf, aux_inf = c.forward({}, jnp.asarray(x), train=False)
    assert aux is not None and aux_inf is None
    np.testing.assert_array_equal(np.asarray(y_tr), np.asarray(y_inf))
    d = rng.normal(size=y_tr.shape).astype(np.float32)
    via_aux = np.asarray(c.backprop({}, jnp.asarray(x), y_tr,
                                    jnp.asarray(d), aux))
    via_mask = np.asarray(c.backprop({}, jnp.asarray(x), y_inf,
                                     jnp.asarray(d), None))
    np.testing.assert_allclose(via_aux, via_mask, atol=1e-6)
    check_backprop(c, {}, x, rng, aux=aux)
