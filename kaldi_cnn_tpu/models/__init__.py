"""nnet2-style neural acoustic models as pure-functional JAX modules.

Re-design of src/nnet2/ (Dan Povey's DNN/CNN framework, the fork's
home): the component chain (Splice, FixedAffine, Affine+NG-SGD, Pnorm,
Normalize, Tanh/ReLU, Dropout, Conv2D, Maxpool3D, Softmax) becomes a
list of stateless component objects whose parameters live in a pytree;
the training step mirrors NnetUpdater::ComputeForMinibatch (explicit
forward/backward walk so each affine/conv layer sees its raw
(in_value, out_deriv) minibatch matrices for the online natural
gradient), all inside one jit.
"""

from kaldi_cnn_tpu.models.ng_sgd import OnlineNaturalGradient
from kaldi_cnn_tpu.models.components import (
    AffineComponent, PnormComponent, NormalizeComponent, TanhComponent,
    RectifiedLinearComponent, SigmoidComponent, SoftmaxComponent,
    FixedAffineComponent, DropoutComponent, SpliceComponent,
    Conv2DComponent, Maxpooling3DComponent, IdentityComponent,
    SliceParallelComponent)
from kaldi_cnn_tpu.models.nnet import Nnet, AmNnet
