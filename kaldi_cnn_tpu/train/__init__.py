"""Training: egs pipeline, NG-SGD trainer with LR schedule and model
combination, checkpointing, data-parallel scaling.

Re-design of the reference's steps/nnet2/train_*.sh orchestration
(nnet-get-egs / nnet-shuffle-egs / nnet-train-parallel /
nnet-am-average / nnet-combine-fast / nnet-adjust-priors) as one
in-process trainer: the N-jobs-plus-averaging architecture becomes a
sharded global batch on a device mesh (see parallel/), with the
reference's exact-replica periodic averaging available as an option.
"""

from kaldi_cnn_tpu.train.egs import EgsConfig, make_egs, EgsBatcher
from kaldi_cnn_tpu.train.trainer import TrainConfig, train_nnet
from kaldi_cnn_tpu.train.checkpoint import save_checkpoint, load_checkpoint
