import time, dataclasses, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "bfloat16")
from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
from kaldi_cnn_tpu.models.nnet import Nnet
from kaldi_cnn_tpu.models import components as C

MB = 4096
rng = np.random.default_rng(0)

def bench_net(name, net):
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    x = jnp.asarray(rng.normal(size=(MB, net.input_dim)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, net.output_dim, MB), jnp.int32)
    p, o, objf = net.train_step(params, opt, x, labels, 0.01)
    jax.device_get(objf)
    t0 = time.perf_counter()
    for _ in range(20):
        p, o, objf = net.train_step(p, o, x, labels, 0.01)
    jax.device_get(objf)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1e3:.2f} ms/step")

base = make_convnet(ConvnetConfig())
bench_net("full", base)

# conv update off
comps = [dataclasses.replace(c, trainable=False)
         if isinstance(c, C.Conv2DComponent) else c
         for c in base.components]
bench_net("conv update OFF", Nnet(comps))

# affine updates off
comps = [dataclasses.replace(c, trainable=False)
         if isinstance(c, C.AffineComponent) else c
         for c in base.components]
bench_net("affine updates OFF", Nnet(comps))

# all updates off (pure fwd+manual bwd walk)
comps = [dataclasses.replace(c, trainable=False)
         if getattr(c, "trainable", False) else c
         for c in base.components]
bench_net("ALL updates OFF", Nnet(comps))
