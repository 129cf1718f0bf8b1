"""NG-SGD fidelity oracle (VERDICT r1 next-round #4).

``ReferenceOnlinePreconditioner`` is a numpy oracle for the semantics of
the reference's OnlinePreconditioner
(ref: src/nnet2/nnet-precondition-online.{h,cc}; Povey/Zhang/Khudanpur
ICLR WS 2015): maintain the damped low-rank-plus-isotropic Fisher
estimate

    F_{t+1} = rank-R truncation of (1-eta) F_t + (eta/N) X_tT X_t,
    X_hat   = X (F_t + alpha tr(F_t)/D I)^{-1},  rescaled so
              ||X_hat||_F == ||X||_F,

computed here EXACTLY (full DxD eigendecomposition per step).  The
reference's ComputeEt/ComputeZt recursion is an O(R^3) algebraic
shortcut for this same update restricted to span(R_t, X_t); with the
reference mount empty its exact coefficient conventions cannot be
cited line-by-line, so the oracle pins the documented mathematical
semantics instead and the tests bound how far the shipped
Gram-sampled-update implementation (models/ng_sgd.py, deviation
documented in its header) drifts from it:

  * top-R eigenbasis tracking (principal-angle overlap),
  * preconditioned-output agreement on fresh batches,
  * end-to-end training dynamics (final objf within tolerance when the
    shipped preconditioner replaces the oracle in the same SGD loop).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_cnn_tpu.models.ng_sgd import NGState, OnlineNaturalGradient


class ReferenceOnlinePreconditioner:
    """Exact (full-matrix) oracle for the online NG update semantics."""

    def __init__(self, dim, rank=8, eta=0.1, alpha=4.0):
        self.dim, self.rank, self.eta, self.alpha = dim, rank, eta, alpha
        # same init as the shipped impl: identity basis, unit spectrum
        self.u = np.eye(rank, dim, dtype=np.float64)
        self.d = np.ones(rank)            # includes rho, like NGState.d
        self.rho = 1.0

    def fisher(self):
        return (self.u.T * (self.d - self.rho)) @ self.u \
            + self.rho * np.eye(self.dim)

    def precondition(self, x):
        """x [N, D] -> (x_hat, with state updated afterwards)."""
        f = self.fisher()
        tr = np.trace(f)
        damp = self.alpha * tr / self.dim
        x_hat = x @ np.linalg.inv(f + damp * np.eye(self.dim))
        x_hat *= np.sqrt((x * x).sum() / max((x_hat * x_hat).sum(),
                                             1e-20))
        self._update(x)
        return x_hat

    def _update(self, x):
        n = x.shape[0]
        f_new = (1 - self.eta) * self.fisher() \
            + self.eta / n * (x.T @ x)
        evals, evecs = np.linalg.eigh(f_new)
        evals, evecs = evals[::-1], evecs[:, ::-1]
        top = evals[:self.rank]
        rest = evals[self.rank:]
        self.rho = max(float(rest.mean()) if len(rest) else 1e-3, 1e-6)
        self.u = evecs[:, :self.rank].T
        self.d = np.maximum(top, self.rho)


def _subspace_overlap(u_a, u_b):
    """Mean squared cosine of principal angles between row spaces."""
    s = np.linalg.svd(np.asarray(u_a, np.float64)
                      @ np.asarray(u_b, np.float64).T,
                      compute_uv=False)
    return float((s ** 2).mean())


def _aniso_batch(rng, n, dim, scales):
    return (rng.normal(size=(n, dim)) * scales).astype(np.float32)


def test_tracks_oracle_eigenbasis():
    dim, rank, n = 32, 8, 64
    rng = np.random.default_rng(0)
    scales = np.ones(dim)
    scales[:rank] = np.linspace(8.0, 3.0, rank)   # strong top-R structure
    ng = OnlineNaturalGradient(rank=rank, eta=0.1, alpha=4.0,
                               update_period=1)
    state = ng.init(dim)
    oracle = ReferenceOnlinePreconditioner(dim, rank, eta=0.1, alpha=4.0)
    for _ in range(200):
        x = _aniso_batch(rng, n, dim, scales)
        _, state = ng.precondition(state, jnp.asarray(x))
        oracle.precondition(x)
    overlap = _subspace_overlap(np.asarray(state.u), oracle.u)
    assert overlap > 0.9, f"eigenbasis overlap {overlap:.3f}"
    # spectra agree to the sampled-update approximation
    d_impl = np.sort(np.asarray(state.d))[::-1]
    d_orac = np.sort(oracle.d)[::-1]
    rel = np.abs(d_impl - d_orac) / d_orac
    assert rel.mean() < 0.5, f"spectrum drift {rel}"


def test_preconditioned_outputs_agree():
    dim, rank, n = 24, 6, 48
    rng = np.random.default_rng(1)
    scales = np.ones(dim)
    scales[:rank] = np.linspace(10.0, 4.0, rank)
    ng = OnlineNaturalGradient(rank=rank, eta=0.1, alpha=4.0,
                               update_period=1)
    state = ng.init(dim)
    oracle = ReferenceOnlinePreconditioner(dim, rank, eta=0.1, alpha=4.0)
    for _ in range(150):
        x = _aniso_batch(rng, n, dim, scales)
        _, state = ng.precondition(state, jnp.asarray(x))
        oracle.precondition(x)
    # fresh batch through both (old-state semantics on each side)
    x = _aniso_batch(rng, n, dim, scales)
    got, _ = ng.precondition(state, jnp.asarray(x))
    got = np.asarray(got, np.float64)
    f = oracle.fisher()
    damp = oracle.alpha * np.trace(f) / dim
    want = x @ np.linalg.inv(f + damp * np.eye(dim))
    want *= np.sqrt((x * x).sum() / (want * want).sum())
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.15, f"preconditioned output drift {rel:.3f}"
    # both must actually precondition: the dominant directions shrink
    plain_top = np.linalg.norm(x[:, :rank])
    assert np.linalg.norm(got[:, :rank]) < plain_top
    assert np.linalg.norm(want[:, :rank]) < plain_top


def test_training_dynamics_match_oracle():
    """Same linear-softmax SGD run with shipped vs oracle NG on the
    gradient rows: final objf within tolerance (the 'validate on RM
    before WSJ' dynamics check at unit-test scale)."""
    rng = np.random.default_rng(2)
    dim, classes, n = 20, 5, 256
    centers = rng.normal(size=(classes, dim)) * 3
    y = rng.integers(0, classes, n)
    x = (centers[y] + rng.normal(size=(n, dim))).astype(np.float32)
    # skew the input covariance so NG matters
    x[:, 0] *= 8.0

    def objf(w):
        logits = x @ w.T
        logits -= logits.max(1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        return float(logp[np.arange(n), y].mean())

    def grad(w, xb, yb):
        logits = xb @ w.T
        logits -= logits.max(1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(1, keepdims=True)
        p[np.arange(len(yb)), yb] -= 1.0
        return p, (p.T @ xb) / len(yb)      # deriv rows, plain grad

    def run(precond_fn):
        w = np.zeros((classes, dim), np.float32)
        idx = np.arange(n)
        r = np.random.default_rng(3)
        for step in range(30):       # under-converged on purpose: the
            r.shuffle(idx)           # skewed covariance still hurts
            xb, yb = x[idx[:64]], y[idx[:64]]
            _, g = grad(w, xb, yb)
            w = w - 0.1 * precond_fn(g, xb)
        return objf(w)

    # oracle NG on the input-row side
    oracle = ReferenceOnlinePreconditioner(dim, rank=6, eta=0.1,
                                           alpha=4.0)

    def orac_pre(g, xb):
        f = oracle.fisher()
        damp = oracle.alpha * np.trace(f) / dim
        ghat = g @ np.linalg.inv(f + damp * np.eye(dim))
        ghat *= np.sqrt((g * g).sum() / max((ghat * ghat).sum(), 1e-20))
        oracle._update(xb.astype(np.float64))
        return ghat

    ng = OnlineNaturalGradient(rank=6, eta=0.1, alpha=4.0,
                               update_period=1)
    st = {"s": ng.init(dim)}

    def impl_pre(g, xb):
        a, c, u = ng.factors(st["s"])
        gu = np.asarray(g) @ np.asarray(u).T
        ghat = a * g + (gu * np.asarray(c)) @ np.asarray(u)
        ghat *= np.sqrt((g * g).sum() / max((ghat * ghat).sum(), 1e-20))
        st["s"] = ng.maybe_update_from_sample(
            st["s"], jnp.asarray(ng.sample_rows(jnp.asarray(xb))),
            jnp.asarray((xb * xb).sum() / len(xb)))
        return np.asarray(ghat)

    f_oracle = run(orac_pre)
    f_impl = run(impl_pre)
    f_plain = run(lambda g, xb: g)
    # both NG runs beat plain SGD and agree with each other
    assert f_impl > f_plain, (f_impl, f_plain)
    assert f_oracle > f_plain, (f_oracle, f_plain)
    assert abs(f_impl - f_oracle) < 0.05, (f_impl, f_oracle, f_plain)


def test_ng_affine_apply_matches_fused(rng):
    """The factored affine update (analytic bias column, algebraic
    max-change norm, delta never materialized) must match the
    materialize-delta path built on fused_ng_delta([x|1], d)."""
    import jax.numpy as jnp
    from kaldi_cnn_tpu.models.ng_sgd import (
        OnlineNaturalGradient, fused_ng_delta, ng_affine_apply)

    ng_in = OnlineNaturalGradient(rank=6, eta=0.2, update_period=2)
    ng_out = OnlineNaturalGradient(rank=5, eta=0.2, update_period=2)
    din, dout, n = 24, 12, 48
    st_in, st_out = ng_in.init(din + 1), ng_out.init(dout)
    w = jnp.asarray(rng.normal(size=(dout, din)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(dout,)), jnp.float32)
    lr, max_change = 0.05, 0.4
    for step in range(6):
        x = jnp.asarray(rng.normal(size=(n, din)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, dout)), jnp.float32)
        ones = jnp.ones((n, 1), jnp.float32)
        in_ext = jnp.concatenate([x, ones], axis=1)
        delta, ref_in, ref_out = fused_ng_delta(
            ng_in, ng_out, st_in, st_out, in_ext, d)
        norm = jnp.sqrt(jnp.sum(delta * delta)) * abs(lr)
        scale = jnp.minimum(1.0, max_change / jnp.maximum(norm, 1e-20))
        ref_w = w + lr * scale * delta[:, :-1]
        ref_b = b + lr * scale * delta[:, -1]
        new_w, new_b, st_in2, st_out2 = ng_affine_apply(
            ng_in, ng_out, st_in, st_out, x, d, w, b, lr, max_change)
        # the factored norm assumes exactly-orthonormal u rows (like
        # gamma already does); after updates the rows are orthonormal
        # to ~1e-3, so the clip scale agrees to ~1e-3 relative
        np.testing.assert_allclose(np.asarray(new_w), np.asarray(ref_w),
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(new_b), np.asarray(ref_b),
                                   rtol=5e-3, atol=5e-4)
        for got, ref in ((st_in2, ref_in), (st_out2, ref_out)):
            np.testing.assert_allclose(np.asarray(got.u),
                                       np.asarray(ref.u),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(got.d),
                                       np.asarray(ref.d),
                                       rtol=2e-4, atol=2e-4)
        w, b, st_in, st_out = new_w, new_b, st_in2, st_out2
