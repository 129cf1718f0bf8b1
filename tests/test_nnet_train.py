"""NG-SGD preconditioner + Nnet train-step tests (style:
nnet2/nnet-precondition-online-test.cc + nnet-update tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_cnn_tpu.models.components import (
    AffineComponent, NormalizeComponent, PnormComponent, SoftmaxComponent,
    TanhComponent)
from kaldi_cnn_tpu.models.ng_sgd import OnlineNaturalGradient
from kaldi_cnn_tpu.models.nnet import AmNnet, Nnet


def test_ng_state_invariants(rng):
    ng = OnlineNaturalGradient(rank=8)
    st = ng.init(32)
    x = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    for _ in range(5):
        xh, st = ng.precondition(st, x)
    u = np.asarray(st.u)
    # rows stay orthonormal-ish
    gram = u @ u.T
    np.testing.assert_allclose(np.diag(gram), 1.0, atol=1e-3)
    assert np.abs(gram - np.diag(np.diag(gram))).max() < 0.05
    assert np.all(np.asarray(st.d) > 0)
    assert float(st.rho) > 0


def test_ng_norm_preserved(rng):
    ng = OnlineNaturalGradient(rank=8)
    st = ng.init(16)
    x = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    xh, _ = ng.precondition(st, x)
    assert float(jnp.linalg.norm(xh)) == pytest.approx(
        float(jnp.linalg.norm(x)), rel=1e-4)


def test_ng_whitens_anisotropic_data(rng):
    """After adaptation, a dominant direction should be damped relative
    to the rest (that's the point of NG)."""
    ng = OnlineNaturalGradient(rank=4, eta=0.5)
    st = ng.init(16)
    # data with one huge direction
    v = np.zeros((1, 16), np.float32)
    v[0, 0] = 1.0
    for i in range(20):
        x = rng.normal(size=(32, 16)).astype(np.float32)
        x += 20.0 * rng.normal(size=(32, 1)).astype(np.float32) @ v
        xh, st = ng.precondition(st, jnp.asarray(x))
    # the dominant direction must appear in the learned basis
    u = np.asarray(st.u)
    assert np.abs(u[:, 0]).max() > 0.9
    # and preconditioning shrinks it relative to other dims
    x = rng.normal(size=(32, 16)).astype(np.float32)
    x += 20.0 * rng.normal(size=(32, 1)).astype(np.float32) @ v
    xh, _ = ng.precondition(st, jnp.asarray(x))
    xh = np.asarray(xh)
    ratio_before = np.abs(x[:, 0]).mean() / np.abs(x[:, 1:]).mean()
    ratio_after = np.abs(xh[:, 0]).mean() / np.abs(xh[:, 1:]).mean()
    assert ratio_after < 0.25 * ratio_before


def _toy_net(input_dim=10, num_classes=4, hidden=32, pnorm_out=8):
    return Nnet([
        AffineComponent(input_dim=input_dim, output_dim=hidden),
        PnormComponent(input_dim=hidden, output_dim=pnorm_out),
        NormalizeComponent(dim=pnorm_out),
        AffineComponent(input_dim=pnorm_out, output_dim=num_classes,
                        param_stddev=0.0),
        SoftmaxComponent(dim=num_classes),
    ], ng_update_period=1)


def _toy_data(rng, n=512, input_dim=10, num_classes=4):
    centers = rng.normal(size=(num_classes, input_dim)).astype(np.float32) * 2
    labels = rng.integers(0, num_classes, n)
    x = centers[labels] + rng.normal(size=(n, input_dim)).astype(np.float32)
    return x.astype(np.float32), labels.astype(np.int32)


def test_train_step_improves_objf(rng):
    net = _toy_net()
    params = net.init(jax.random.PRNGKey(1))
    opt = net.init_opt()
    x, labels = _toy_data(rng)
    objf0 = float(net.objf(params, jnp.asarray(x), jnp.asarray(labels)))
    for epoch in range(80):
        key = np.array([0, epoch], np.uint32)
        params, opt, objf = net.train_step(
            params, opt, jnp.asarray(x), jnp.asarray(labels), lr=0.08,
            key=key)
    objf_end = float(net.objf(params, jnp.asarray(x), jnp.asarray(labels)))
    assert objf_end > objf0 + 1.5
    assert objf_end > np.log(0.5)  # well-separated classes: >50% prob
    acc = (np.asarray(net.predict(params, jnp.asarray(x))).argmax(1)
           == labels).mean()
    assert acc > 0.9


def test_train_step_bf16_storage_matches_f32(rng):
    """The TPU train path stores activations/derivatives in bf16
    (Nnet.train_storage_dtype, backend default on TPU — PERF.md §1's
    backward-HBM floor halver).  On the conv+pool flagship topology the
    bf16-stored run must train to the same place as the f32 run: same
    monotone objf improvement, final objf within a few % (the MXU
    already reads bf16 under the trainer's precision default, so
    storage is the only extra rounding)."""
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

    cfg = ConvnetConfig(
        in_t=6, in_f=12, in_c=1, filt_t=3, filt_f=5, num_filters=16,
        pool_t=2, pool_f=2, pool_c=1, num_hidden_layers=1,
        pnorm_input_dim=64, pnorm_output_dim=16, num_pdfs=8)

    def run(storage):
        net = make_convnet(cfg, use_pallas=False)
        net.train_storage_dtype = storage
        params = net.init(jax.random.PRNGKey(7))
        opt = net.init_opt()
        r = np.random.default_rng(7)
        x = jnp.asarray(r.normal(size=(64, net.input_dim)), jnp.float32)
        labels = jnp.asarray(r.integers(0, cfg.num_pdfs, 64), jnp.int32)
        objfs = []
        for s in range(50):
            params, opt, objf = net.train_step(
                params, opt, x, labels, lr=0.05,
                key=np.array([2, s], np.uint32))
            objfs.append(float(objf))
        return objfs

    f32 = run("float32")
    bf16 = run("bfloat16")
    assert all(np.isfinite(bf16))
    assert bf16[-1] > bf16[0] + 0.4          # it actually learns
    # measured drift at this scale is ~2e-4 nats; 0.05 leaves margin
    assert abs(bf16[-1] - f32[-1]) < 0.05    # and lands where f32 does


def test_train_step_ng_vs_plain_convergence(rng):
    """NG-preconditioned training should not be worse than plain SGD on
    badly scaled inputs (the reference's motivation for NG-SGD)."""
    x, labels = _toy_data(rng, n=512)
    x_bad = x.copy()
    x_bad[:, 0] *= 50.0   # one huge-variance input dim

    def run(update_period, steps=25, lr=0.02):
        net = _toy_net()
        net.ng_in = OnlineNaturalGradient(rank=20,
                                          update_period=update_period)
        net.ng_out = OnlineNaturalGradient(rank=20,
                                           update_period=update_period)
        # plain SGD == NG with near-zero adaptation (identity-ish F)
        if update_period == 0:
            net.ng_in = OnlineNaturalGradient(rank=1, eta=0.0,
                                              update_period=10 ** 9,
                                              warmup_updates=0)
            net.ng_out = OnlineNaturalGradient(rank=1, eta=0.0,
                                               update_period=10 ** 9,
                                               warmup_updates=0)
        params = net.init(jax.random.PRNGKey(3))
        opt = net.init_opt()
        for s in range(steps):
            params, opt, objf = net.train_step(
                params, opt, jnp.asarray(x_bad), jnp.asarray(labels),
                lr=lr, key=np.array([1, s], np.uint32))
        return float(net.objf(params, jnp.asarray(x_bad),
                              jnp.asarray(labels)))

    ng = run(1)
    plain = run(0)
    assert ng > plain - 0.05


def test_am_nnet_loglikes_shape(rng):
    net = _toy_net()
    params = net.init(jax.random.PRNGKey(0))
    am = AmNnet(net)
    am.set_priors_from_counts(np.asarray([10, 20, 30, 40]))
    feats = rng.normal(size=(37, 10)).astype(np.float32)
    ll = am.loglikes(params, feats, batch_size=16)
    assert ll.shape == (37, 4)
    assert np.isfinite(ll).all()


def test_fused_ng_delta_matches_materialized(rng):
    """fused_ng_delta must equal d̂ᵀx̂ computed via the materialized
    precondition() path (same old-state factors, same rescale, same
    state update)."""
    from kaldi_cnn_tpu.models.ng_sgd import fused_ng_delta

    # warmup_updates=0 so the period-4 gate's SKIP branch is really
    # exercised within the 6 steps (the default warmup would update
    # every step here)
    ng_in = OnlineNaturalGradient(rank=6, eta=0.2, update_period=4,
                                  warmup_updates=0)
    ng_out = OnlineNaturalGradient(rank=5, eta=0.2, update_period=4,
                                   warmup_updates=0)
    st_in = ng_in.init(24)
    st_out = ng_out.init(12)
    # run a few steps so the states leave the identity init and the
    # update_period gate is exercised on both branches
    for step in range(6):
        x = jnp.asarray(rng.normal(size=(48, 24)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(48, 12)), jnp.float32)
        xh, ref_in = ng_in.precondition(st_in, x)
        dh, ref_out = ng_out.precondition(st_out, d)
        ref_delta = dh.T @ xh
        delta, new_in, new_out = fused_ng_delta(
            ng_in, ng_out, st_in, st_out, x, d)
        np.testing.assert_allclose(np.asarray(delta),
                                   np.asarray(ref_delta),
                                   rtol=2e-4, atol=2e-4)
        # 1e-4: the fused path's x_sq/sample stats use dot_general
        # contractions (f32-accumulating einsum) whose reduction order
        # differs from precondition()'s jnp.sum — same math, last-ulp
        # reassociation noise only
        for a, b in zip(new_in, ref_in):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
        for a, b in zip(new_out, ref_out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
        st_in, st_out = new_in, new_out


def test_per_component_combine_beats_whole_model_and_keep_last(rng):
    """VERDICT round-2 item 7 'done' bar: per-component combination
    (ref: nnet2/nnet-combine-fast.cc granularity) beats both the
    whole-model softmax mix and keep-last on validation log-prob.
    Construction: two candidate models, each with ONE good and ONE
    corrupted affine layer (complementary) — only per-component weights
    can select good/good."""
    from kaldi_cnn_tpu.train.egs import Egs
    from kaldi_cnn_tpu.train.trainer import (
        TrainConfig, _valid_objf, combine_models,
        combine_models_per_component, train_nnet)

    n, d, k = 1536, 10, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    wtrue = rng.normal(size=(d, k)).astype(np.float32)
    y = np.argmax(x @ wtrue, axis=1).astype(np.int32)
    egs_train = Egs(x[:1024], y[:1024], np.ones(1024, np.float32))
    egs_valid = Egs(x[1024:], y[1024:], np.ones(n - 1024, np.float32))
    net = Nnet([AffineComponent(d, 16), TanhComponent(16),
                AffineComponent(16, k), SoftmaxComponent(k)])
    cfg = TrainConfig(num_epochs=4, minibatch_size=128,
                      initial_learning_rate=0.05,
                      final_learning_rate=0.02, seed=0)
    good, _ = train_nnet(net, egs_train, egs_valid, cfg)
    good = jax.device_get(good)

    def corrupt(params, comp_idx, seed):
        r = np.random.default_rng(seed)
        out = [dict(p) for p in params]
        out[comp_idx] = {
            kk: np.asarray(v) + 1.5 * r.normal(
                size=np.shape(v)).astype(np.float32)
            for kk, v in out[comp_idx].items()}
        return tuple(out)

    model_a = corrupt(good, 2, 1)   # good affine0, bad affine2
    model_b = corrupt(good, 0, 2)   # bad affine0, good affine2
    candidates = [model_a, model_b]
    pc = combine_models_per_component(net, candidates, egs_valid, cfg)
    wm = combine_models(net, candidates, egs_valid, cfg)
    objf_pc = _valid_objf(net, pc, egs_valid, cfg)
    objf_wm = _valid_objf(net, wm, egs_valid, cfg)
    objf_last = _valid_objf(net, candidates[-1], egs_valid, cfg)
    assert objf_pc > objf_wm + 0.01
    assert objf_pc > objf_last + 0.01


def test_two_am_nnets_do_not_retrace_each_other(rng):
    """Two live AmNnets (the wsj eval_dnn CNN-vs-DNN configuration)
    must each keep their own compiled predict fn: an lru_cache(1) on
    the method was shared class-wide, so alternating loglikes() calls
    evicted and retraced every time."""
    net_a, net_b = _toy_net(), _toy_net(hidden=24, pnorm_out=6)
    am_a, am_b = AmNnet(net_a), AmNnet(net_b)
    pa = net_a.init(jax.random.PRNGKey(0))
    pb = net_b.init(jax.random.PRNGKey(1))
    feats = rng.normal(size=(16, 10)).astype(np.float32)
    # prime both, then verify alternation reuses the same fn objects
    am_a.loglikes(pa, feats, batch_size=16)
    am_b.loglikes(pb, feats, batch_size=16)
    fn_a, fn_b = am_a._predict_jit(), am_b._predict_jit()
    assert fn_a is not fn_b
    for _ in range(3):
        am_a.loglikes(pa, feats, batch_size=16)
        am_b.loglikes(pb, feats, batch_size=16)
        assert am_a._predict_jit() is fn_a
        assert am_b._predict_jit() is fn_b
    # and the compile caches did not churn: one compilation each
    assert fn_a._cache_size() == 1
    assert fn_b._cache_size() == 1


def test_train_storage_dtype_validation():
    net = _toy_net()
    net.train_storage_dtype = "float16"
    with pytest.raises(ValueError):
        net._storage_dtype()
    net.train_storage_dtype = "bf16"
    assert net._storage_dtype() == jnp.bfloat16
    net.train_storage_dtype = "f32"
    assert net._storage_dtype() is None


def test_ng_update_period_default_parity(rng):
    """The round-5 default preconditioner schedule (update every step
    for the first warmup_updates, then every 16th — amortizing the
    latency-bound Fisher eigh chain once the estimate has converged)
    must train the conv topology to the same place as the reference's
    fixed period 4, measured PAST the warmup horizon."""
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

    cfg = ConvnetConfig(
        in_t=6, in_f=12, in_c=1, filt_t=3, filt_f=5, num_filters=16,
        pool_t=2, pool_f=2, pool_c=1, num_hidden_layers=1,
        pnorm_input_dim=64, pnorm_output_dim=16, num_pdfs=8)

    def run(reference_schedule: bool):
        net = make_convnet(cfg, use_pallas=False)
        if reference_schedule:       # fixed period 4, no warmup
            net.ng_in = OnlineNaturalGradient(rank=net.ng_in.rank,
                                              update_period=4,
                                              warmup_updates=0)
            net.ng_out = OnlineNaturalGradient(rank=net.ng_out.rank,
                                               update_period=4,
                                               warmup_updates=0)
        params = net.init(jax.random.PRNGKey(7))
        opt = net.init_opt()
        r = np.random.default_rng(7)
        x = jnp.asarray(r.normal(size=(64, net.input_dim)), jnp.float32)
        labels = jnp.asarray(r.integers(0, cfg.num_pdfs, 64), jnp.int32)
        for s in range(120):         # 2x the warmup horizon
            params, opt, objf = net.train_step(
                params, opt, x, labels, lr=0.05,
                key=np.array([3, s], np.uint32))
        return float(objf)

    ref, ours = run(True), run(False)
    assert ours > ref - 0.05, (ref, ours)


def test_trainer_scan_steps_matches_per_step(rng):
    """TrainConfig.scan_steps groups minibatches into ONE scanned
    dispatch (Nnet.train_steps); the math must equal the per-step loop
    exactly — same batches, lrs, keys, same final params."""
    from kaldi_cnn_tpu.train.egs import Egs
    from kaldi_cnn_tpu.train.trainer import TrainConfig, train_nnet

    x, labels = _toy_data(rng, n=300)
    egs = Egs(x, labels, np.ones(len(labels), np.float32))
    valid = Egs(x[:64], labels[:64], np.ones(64, np.float32))

    def run(k):
        net = _toy_net()
        params, _ = train_nnet(
            net, egs, valid,
            TrainConfig(num_epochs=2, minibatch_size=64, seed=5,
                        scan_steps=k, combine_num_models=1))
        return params

    p1, p8 = run(1), run(8)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_loglikes_batch_matches_per_utt(rng):
    """AmNnet.loglikes_batch (one padded stream over a keyed
    utterance set) must equal per-utterance loglikes() exactly."""
    net = _toy_net()
    params = net.init(jax.random.PRNGKey(0))
    am = AmNnet(net)
    am.set_priors_from_counts(np.asarray([10, 20, 30, 40]))
    feats = {f"u{i}": rng.normal(size=(13 + 7 * i, 10)).astype(np.float32)
             for i in range(5)}
    got = am.loglikes_batch(params, feats, batch_size=32)
    for u, f in feats.items():
        ref = am.loglikes(params, f, batch_size=32)
        np.testing.assert_allclose(got[u], ref, rtol=1e-5, atol=1e-5)
    assert set(got) == set(feats)
