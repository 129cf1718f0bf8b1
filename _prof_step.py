import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "bfloat16")
from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

MB = 4096
net = make_convnet(ConvnetConfig())
params = net.init(jax.random.PRNGKey(0))
opt = net.init_opt()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(MB, net.input_dim)), jnp.float32)
labels = jnp.asarray(rng.integers(0, net.output_dim, MB), jnp.int32)

def timeit(name, fn, n=20):
    r = fn()
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    rs = None
    for _ in range(n):
        rs = fn()
    jax.device_get(jax.tree_util.tree_leaves(rs)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt

# 1. forward only
fwd = jax.jit(lambda p, x: net.predict(p, x))
timeit("forward", lambda: fwd(params, x))

# 2. forward+backward via grad of objf (no NG, no update)
def loss(p, x, labels):
    out = net.predict(p, x)
    post = jnp.maximum(out, 1e-20)
    picked = jnp.take_along_axis(post, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(jnp.log(picked))
g = jax.jit(jax.grad(loss))
timeit("fwd+bwd(grad)", lambda: g(params, x, labels))

# 3. full train step
st = {"params": params, "opt": opt}
def full():
    p2, o2, objf = net.train_step(st["params"], st["opt"], x, labels, 0.01)
    return objf
timeit("full train_step", lambda: full())

# 4. per-component forward timing
acts = [x]
for i, c in enumerate(net.components):
    f = jax.jit(lambda p, a, c=c: c.forward(p, a, train=False, key=None)[0])
    a = acts[-1]
    y = f(params[i], a)
    jax.device_get(y)
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(params[i], a)
    jax.device_get(y)
    dt = (time.perf_counter() - t0) / 20
    print(f"  comp {i} {type(c).__name__}: {dt*1e3:.2f} ms  out={y.shape}")
    acts.append(y)
