"""Pitch extraction (Kaldi-pitch style: NCCF + Viterbi smoothing).

Clean-room equivalent of src/feat/pitch-functions.{h,cc}
(ComputeKaldiPitch, Ghahremani et al. 2014): per-frame normalized
cross-correlation over candidate lags, Viterbi smoothing with a
log-lag transition penalty, output (POV feature, pitch in Hz) per
frame — the 2-dim stream the online pipeline appends
(process-kaldi-pitch-feats semantics, simplified: POV = max NCCF).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from kaldi_cnn_tpu.core.config import configclass


@configclass
class PitchOptions:
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    penalty_factor: float = 0.1
    num_lags: int = 64


def compute_pitch(wave: np.ndarray,
                  opts: Optional[PitchOptions] = None) -> np.ndarray:
    """[N] -> [T, 2] columns (pov, pitch_hz)."""
    opts = opts or PitchOptions()
    sr = opts.samp_freq
    shift = int(sr * opts.frame_shift_ms / 1000.0)
    wlen = int(sr * opts.frame_length_ms / 1000.0)
    wave = np.asarray(wave, np.float64)
    T = max(0, (len(wave) - wlen) // shift + 1)
    lags = np.exp(np.linspace(np.log(sr / opts.max_f0),
                              np.log(sr / opts.min_f0), opts.num_lags))
    lags = np.unique(np.round(lags).astype(int))
    lags = lags[lags < wlen - 2]
    L = len(lags)
    if T == 0 or L == 0:
        return np.zeros((0, 2), np.float32)
    nccf = np.zeros((T, L))
    for t in range(T):
        seg = wave[t * shift: t * shift + wlen]
        seg = seg - seg.mean()
        e0 = np.dot(seg, seg) + 1e-10
        for j, lag in enumerate(lags):
            a, b = seg[:wlen - lag], seg[lag:]
            denom = np.sqrt((np.dot(a, a) + 1e-10)
                            * (np.dot(b, b) + 1e-10))
            nccf[t, j] = np.dot(a, b) / denom
    # Viterbi over lag candidates with log-lag jump penalty
    loglag = np.log(lags)
    pen = opts.penalty_factor * (loglag[None, :] - loglag[:, None]) ** 2
    cost = -nccf[0]
    back = np.zeros((T, L), np.int32)
    for t in range(1, T):
        tot = cost[:, None] + pen
        back[t] = np.argmin(tot, axis=0)
        cost = tot[back[t], np.arange(L)] - nccf[t]
    path = np.zeros(T, np.int32)
    path[-1] = int(np.argmin(cost))
    for t in range(T - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    pitch = sr / lags[path]
    pov = nccf[np.arange(T), path]
    return np.stack([pov, pitch], axis=1).astype(np.float32)


def add_pitch_features(feats: np.ndarray,
                       pitch_feats: np.ndarray) -> np.ndarray:
    """Append (pov, normalized log pitch) columns
    (ref: paste-feats in the pitch recipes)."""
    T = min(len(feats), len(pitch_feats))
    logp = np.log(np.maximum(pitch_feats[:T, 1], 1.0))
    logp = logp - logp.mean()
    return np.concatenate(
        [feats[:T], pitch_feats[:T, :1], logp[:, None]], axis=1
    ).astype(np.float32)
