"""Feature extraction: framing, STFT(-as-matmul), mel, fbank/MFCC, CMVN,
deltas, splicing.

TPU-native replacement for Kaldi's ``src/feat/`` (feature-window.cc,
feature-fbank.cc, feature-mfcc.cc, mel-computations.cc,
feature-functions.cc).  The jnp pipeline in ``functional.py`` is the
reference implementation; the fused Pallas kernel lives in
``kaldi_cnn_tpu.ops.fbank_pallas`` and is golden-tested against it
(SURVEY.md §4 GPU-vs-CPU oracle pattern).
"""

from kaldi_cnn_tpu.features.functional import (
    FrameExtractionOptions,
    MelBanksOptions,
    FbankOptions,
    MfccOptions,
    frame_signal,
    mel_banks,
    dct_matrix,
    compute_fbank,
    compute_mfcc,
    apply_cmvn,
    sliding_window_cmn,
    compute_deltas,
    splice_frames,
)
