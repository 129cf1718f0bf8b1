"""Pallas TPU kernels + jnp reference implementations.

TPU-native rebirth of Kaldi's ``src/cudamatrix/cu-kernels.cu`` and the
fork's custom CNN CUDA kernels: every kernel here has a pure-jnp
reference implementation and a golden test against it (the reference's
GPU-vs-CPU oracle pattern, SURVEY.md §4).
"""

from kaldi_cnn_tpu.ops.common import use_interpret
