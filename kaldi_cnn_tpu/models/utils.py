"""nnet2 model utilities: feature transform, mixup, fix.

Clean-room equivalents of:
  - src/nnet2/get-feature-transform.{h,cc} (FeatureTransformEstimate):
    the LDA-like whitening preprocessing transform every train_*.sh
    inserts as a FixedAffineComponent in front of the net;
  - src/nnet2bin/nnet-am-mixup.cc (+ SumGroupComponent of
    nnet-component.cc): expand the final softmax into per-pdf mixtures
    summed by group — "Gaussian mixing-up" for nets;
  - src/nnet2bin/nnet-am-fix.cc (FixNnet): rescale input weights of
    saturated / dead nonlinearity units from activation statistics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_cnn_tpu.core.logging import get_logger
from kaldi_cnn_tpu.models.components import (
    AffineComponent, FixedAffineComponent, Params, RectifiedLinearComponent,
    SigmoidComponent, SoftmaxComponent, TanhComponent)
from kaldi_cnn_tpu.models.nnet import Nnet

logger = get_logger(__name__)


# -- SumGroupComponent -------------------------------------------------------

@dataclass(frozen=True)
class SumGroupComponent:
    """y[:, g] = sum over x columns of group g
    (ref: nnet-component.cc SumGroupComponent)."""

    sizes: Tuple[int, ...]
    trainable: bool = False

    @property
    def input_dim(self):
        return sum(self.sizes)

    @property
    def output_dim(self):
        return len(self.sizes)

    def _group_ids(self) -> np.ndarray:
        return np.repeat(np.arange(len(self.sizes)),
                         np.asarray(self.sizes))

    def init(self, key) -> Params:
        return {}

    def forward(self, params, x, train=False, key=None):
        gid = jnp.asarray(self._group_ids())
        y = jax.ops.segment_sum(x.T, gid,
                                num_segments=len(self.sizes)).T
        return y, None

    def backprop(self, params, in_value, out_value, out_deriv, aux):
        gid = self._group_ids()
        return out_deriv[:, jnp.asarray(gid)]


# -- get-feature-transform ---------------------------------------------------

def estimate_feature_transform(x: np.ndarray, labels: np.ndarray,
                               dim: Optional[int] = None,
                               within_class_factor: float = 0.001
                               ) -> FixedAffineComponent:
    """LDA-like whitening preprocessing transform from labeled egs
    (ref: FeatureTransformEstimate::Estimate — an LDA without
    dimensionality reduction by default, scaling within-class variance
    to within_class_factor so the net's input is decorrelated)."""
    from kaldi_cnn_tpu.transform.lda import LdaEstimate
    num_classes = int(labels.max()) + 1
    lda = LdaEstimate(num_classes, x.shape[1])
    lda.accumulate(x, labels)
    out_dim = dim or x.shape[1]
    T, _ = lda.estimate(out_dim,
                        within_class_factor=np.sqrt(within_class_factor)
                        if within_class_factor != 1.0 else 1.0)
    return FixedAffineComponent.from_matrix(
        T[:, :-1].astype(np.float32), T[:, -1].astype(np.float32))


# -- mixup -------------------------------------------------------------------

def mixup_nnet(net: Nnet, params, target_components: int,
               seed: int = 0, perturb: float = 0.01):
    """Expand [final affine -> softmax] into mixtures summed per pdf
    (ref: nnet-am-mixup.cc MixupNnet): rows of the final affine split
    proportionally to a uniform target, outputs regrouped by
    SumGroupComponent.  Returns (new net, new params)."""
    assert isinstance(net.components[-1], SoftmaxComponent)
    aff_idx = len(net.components) - 2
    aff = net.components[aff_idx]
    assert isinstance(aff, AffineComponent)
    num_pdfs = aff.output_dim
    per = max(1, target_components // num_pdfs)
    sizes = tuple(per for _ in range(num_pdfs))
    rng = np.random.default_rng(seed)
    w = np.asarray(params[aff_idx]["w"])
    b = np.asarray(params[aff_idx]["b"])
    new_w = np.repeat(w, per, axis=0)
    new_b = np.repeat(b, per, axis=0)
    # perturb the copies and renormalize the bias so the summed prob is
    # initially unchanged: softmax groups of k identical rows sum to
    # k * p, so subtract log(k)
    noise = perturb * rng.standard_normal(new_w.shape).astype(w.dtype)
    new_w = new_w + noise * np.abs(new_w).mean()
    new_b = new_b - np.log(per)
    new_aff = AffineComponent(aff.input_dim, num_pdfs * per,
                              max_change=aff.max_change)
    comps = list(net.components)
    comps[aff_idx] = new_aff
    comps[aff_idx + 1] = SoftmaxComponent(num_pdfs * per)
    comps.append(SumGroupComponent(sizes))
    new_net = Nnet(comps, ng_update_period=net.ng_in.update_period)
    new_params = list(params)
    new_params[aff_idx] = {"w": jnp.asarray(new_w),
                           "b": jnp.asarray(new_b)}
    new_params.append({})
    logger.info("mixup: %d pdfs x %d mixtures", num_pdfs, per)
    return new_net, tuple(new_params)


# -- nnet-fix ----------------------------------------------------------------

def fix_nnet(net: Nnet, params, x_sample: np.ndarray,
             max_average_deriv: float = 0.75,
             min_average_deriv: float = 0.05,
             relu_dead_fraction: float = 0.02,
             scale: float = 0.5):
    """Rescale input weights of pathological nonlinearity units from
    activation statistics on a sample batch (ref: nnet-am-fix.cc
    FixNnet: saturated sigmoid/tanh units get their incoming weights
    scaled down; dead ReLUs get theirs scaled up)."""
    import jax.numpy as jnp
    _, acts, _ = net.forward(params, jnp.asarray(x_sample), train=False)
    new_params = list(params)
    n_fixed = 0
    for i, c in enumerate(net.components):
        prev = net.components[i - 1] if i > 0 else None
        if not isinstance(prev, AffineComponent):
            continue
        pre = np.asarray(acts[i])      # input to the nonlinearity
        if isinstance(c, (TanhComponent, SigmoidComponent)):
            # average |derivative| per unit: saturation -> ~0
            if isinstance(c, TanhComponent):
                deriv = 1.0 - np.tanh(pre) ** 2
            else:
                s = 1.0 / (1.0 + np.exp(-pre))
                deriv = 4.0 * s * (1.0 - s)  # normalized to max 1
            avg = deriv.mean(axis=0)
            bad = avg < min_average_deriv
        elif isinstance(c, RectifiedLinearComponent):
            frac = (pre > 0).mean(axis=0)
            bad = frac < relu_dead_fraction
        else:
            continue
        if bad.any():
            w = np.asarray(new_params[i - 1]["w"])
            b = np.asarray(new_params[i - 1]["b"])
            factor = np.where(
                bad, (1.0 / scale
                      if isinstance(c, RectifiedLinearComponent)
                      else scale), 1.0).astype(w.dtype)
            new_params[i - 1] = {
                "w": jnp.asarray(w * factor[:, None]),
                "b": jnp.asarray(b * factor)}
            n_fixed += int(bad.sum())
    logger.info("nnet-fix: adjusted %d units", n_fixed)
    return tuple(new_params)
