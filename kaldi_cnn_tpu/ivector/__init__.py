"""iVector speaker modeling: UBM, total-variability extractor, VAD,
PLDA — re-design of src/ivector/ (SURVEY.md §2) for the Switchboard
CNN + iVector configuration."""

from kaldi_cnn_tpu.ivector.extractor import (
    IvectorExtractor, length_normalize, train_ubm, utt_stats)
from kaldi_cnn_tpu.ivector.vad import VadOptions, compute_vad, log_energy
from kaldi_cnn_tpu.ivector.plda import Plda, estimate_plda
