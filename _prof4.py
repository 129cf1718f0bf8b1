import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "bfloat16")
from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

MB = 4096
rng = np.random.default_rng(0)
net = make_convnet(ConvnetConfig())
conv = net.components[0]
x = jnp.asarray(rng.normal(size=(MB, conv.input_dim)), jnp.float32)
d = jnp.asarray(rng.normal(size=(MB, conv.output_dim)), jnp.float32)

def t(name, f, *a):
    r = f(*a); jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(10): r = f(*a)
    jax.device_get(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

t("extract_patches", jax.jit(lambda x: jnp.sum(conv.extract_patches(x))), x)

def full_g(x, d):
    pat = conv.extract_patches(x).reshape(-1, conv.patch_dim)
    dd = d.reshape(-1, conv.num_filters)
    return jnp.sum(dd.T @ pat)
t("extract+G gemm", jax.jit(full_g), x, d)

u_i = jnp.asarray(rng.normal(size=(21, conv.patch_dim)), jnp.float32)
u_o = jnp.asarray(rng.normal(size=(80, conv.num_filters)), jnp.float32)

def full_pin(x, u):
    pat = conv.extract_patches(x).reshape(-1, conv.patch_dim)
    return jnp.sum((pat @ u.T) ** 2, axis=0)
t("extract+p_in proj", jax.jit(full_pin), x, u_i)

t("p_out = d@u_o.T (sum)", jax.jit(
    lambda d, u: jnp.sum((d.reshape(-1, conv.num_filters) @ u.T) ** 2,
                         axis=0)), d, u_o)

w = conv.init(jax.random.PRNGKey(0))["w"]
def gvjp(x, d):
    xi = x.reshape(MB, conv.in_t, conv.in_f, conv.in_c)
    dres = d.reshape(MB, conv.out_t, conv.out_f, conv.num_filters)
    _, vjp = jax.vjp(lambda w: conv._conv_nhwc(xi, w), w)
    return jnp.sum(vjp(dres)[0])
t("G via conv-backward-filter", jax.jit(gvjp), x, d)

def pin_conv(x, u):
    xi = x.reshape(MB, conv.in_t, conv.in_f, conv.in_c)
    kernel = u.reshape(u.shape[0], conv.filt_t, conv.filt_f, conv.in_c
                       ).transpose(1, 2, 3, 0)
    y = jax.lax.conv_general_dilated(
        xi, kernel, (conv.stride_t, conv.stride_f), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.sum(y.reshape(-1, u.shape[0]) ** 2, axis=0)
t("p_in via conv(u_i filters)", jax.jit(pin_conv), x, u_i)
