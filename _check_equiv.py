import os
pass
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
from kaldi_cnn_tpu.models.components import _ng_affine_update

net = make_convnet(ConvnetConfig())
conv = net.components[0]
rng = np.random.default_rng(0)
n = 32
x = jnp.asarray(rng.normal(size=(n, conv.input_dim)), jnp.float32)
d = jnp.asarray(rng.normal(size=(n, conv.output_dim)), jnp.float32)
params = conv.init(jax.random.PRNGKey(0))
opt = conv.init_opt(net.ng_in, net.ng_out)

# reference: old im2col path
patches = conv.extract_patches(x).reshape(-1, conv.patch_dim)
dd = d.reshape(-1, conv.num_filters)
p_ref, o_ref = _ng_affine_update(params, opt, patches, dd, 0.01,
                                 net.ng_in, net.ng_out, conv.max_change)
# new conv-native path
p_new, o_new = conv.update(params, opt, x, d, 0.01, net.ng_in, net.ng_out)

for k in ("w", "b"):
    a, b = np.asarray(p_ref[k]), np.asarray(p_new[k])
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(k, "rel err", err)
    assert err < 2e-5, (k, err)
for side in ("ng_in", "ng_out"):
    for f in ("u", "d", "rho"):
        a = np.asarray(getattr(o_ref[side], f))
        b = np.asarray(getattr(o_new[side], f))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(side, f, "rel err", err)
        assert err < 2e-4, (side, f, err)
print("EQUIVALENT")
