import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "bfloat16")
from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

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
    print(f"{name}: {dt*1e3:.2f} ms/step -> {MB/dt/100:.0f} audio-s/s")

net = make_convnet(ConvnetConfig())
bench_net("default (period=4)", net)

net2 = make_convnet(ConvnetConfig())
net2.ng_in.update_period = 10**9
net2.ng_out.update_period = 10**9
bench_net("no NG state updates (period=inf)", net2)

net3 = make_convnet(ConvnetConfig())
net3.ng_in.update_period = 1
net3.ng_out.update_period = 1
bench_net("period=1", net3)

# timing eigh alone
for n in (40, 160):
    m = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    m = m @ m.T
    f = jax.jit(jnp.linalg.eigh)
    r = f(m); jax.device_get(r[0])
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(m)
    jax.device_get(r[0])
    print(f"eigh {n}x{n}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
