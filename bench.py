"""Headline benchmark: CNN acoustic-model training throughput.

Measures the full nnet2-equivalent training hot loop (forward, backward,
NG-SGD preconditioning, parameter update; ref:
src/nnet2/nnet-update.cc NnetUpdater::ComputeForMinibatch) on the
flagship Conv2D+Maxpool3D+p-norm model, and reports audio-seconds of
speech processed per wall-second per chip (frames / 100 frames-per-sec).

Baseline: the reference's K20-era CUDA nnet2 convnet training runs
~2-4k frames/s per GPU (exp/*/log/train.*.log frames-per-sec lines;
BASELINE.md "Train throughput" row — not published directly, so we take
3000 frames/s = 30 audio-s/s as the comparison point, to be re-anchored
when the reference mount is populated).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Single-pass bf16 MXU matmuls: verified to converge identically to the
# f32 default on the p-norm/CNN training tasks (held-out logprob match
# to 4 decimals); the MXU is a bf16 systolic array, f32 matmuls cost
# 3 passes (measured full-step 48 ms f32 vs 38 ms bf16 at mb 4096
# pre-optimization).
jax.config.update("jax_default_matmul_precision", "bfloat16")

from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet

BASELINE_AUDIO_SS = 30.0     # K20-era CUDA reference, see module docstring
FRAMES_PER_SECOND = 100.0    # 10 ms frame shift
MINIBATCH = 4096
# warmup must clear the NG preconditioner's warmup_updates horizon
# (64 every-step Fisher refreshes, ~16 ms/step) so the timed window
# measures the steady state (eigh every 16th step, ~9.5 ms/step)
WARMUP = 80
STEPS = 30  # at mb 4096

# TPU v5e (v5 lite) peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM
# (public spec sheet numbers; the chip this image exposes).
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5": 459e12,
              "TPU v4": 275e12}
PEAK_HBM = {"TPU v5 lite": 819e9, "TPU v5": 2765e9, "TPU v4": 1228e9}


def _peaks():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    for k in PEAK_FLOPS:
        if kind.startswith(k):
            return PEAK_FLOPS[k], PEAK_HBM[k]
    return None, None


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(jnp.sum(leaves[0].ravel()[:1]))


def _time_fn(fn, *args, steps: int = 20, warmup: int = 3) -> float:
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps


def _flops_bytes(jfn, *args):
    """XLA's own cost analysis of the compiled executable (flops, HBM
    bytes); None if the backend doesn't expose it."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def _entry(name, ms, flops, nbytes, peak_f, peak_b):
    e = {"ms": round(ms * 1e3, 4)}
    if flops:
        e["gflops"] = round(flops / 1e9, 3)
        if peak_f:
            e["mfu"] = round(flops / ms / peak_f, 4)
    if nbytes:
        e["mb_accessed"] = round(nbytes / 1e6, 2)
        if peak_b:
            frac = nbytes / ms / peak_b
            if frac <= 1.0:
                e["hbm_frac"] = round(frac, 4)
            else:
                # cost-analysis bytes exceed what the HBM could move in
                # the measured time — the estimator double-counts (e.g.
                # pallas CostEstimate bytes for ops XLA fused away), so
                # this is NOT a roofline fraction; annotate instead
                e["bytes_estimated_unreliable"] = True
    if "mfu" in e or "hbm_frac" in e:
        e["roofline_frac"] = round(max(e.get("mfu", 0.0),
                                       e.get("hbm_frac", 0.0)), 4)
    return e


def roofline() -> dict:
    """Per-kernel speed-of-light accounting at flagship shapes
    (SURVEY.md §7 step 10; BASELINE.json 'speed-of-light on the
    conv/maxpool and STFT kernels').  roofline_frac = achieved fraction
    of the binding resource (MXU flops or HBM bandwidth)."""
    from kaldi_cnn_tpu.features import functional as F
    from kaldi_cnn_tpu.models.components import (
        Conv2DComponent, Maxpooling3DComponent)
    from kaldi_cnn_tpu.models.factory import ConvnetConfig
    from kaldi_cnn_tpu.ops.fbank_pallas import fbank_pallas

    peak_f, peak_b = _peaks()
    rng = np.random.default_rng(0)
    out = {}

    # ---- fbank / STFT (120 s of 16 kHz audio = 12000 frames)
    opts = F.FbankOptions()
    opts.frame_opts.dither = 0.0
    wave = jnp.asarray(rng.normal(size=16000 * 120).astype(np.float32)
                       * 1000)
    f_pal = jax.jit(lambda w: fbank_pallas(w, opts))
    f_xla = jax.jit(lambda w: F.compute_fbank(w, opts))
    for name, fn in (("fbank_pallas", f_pal), ("fbank_xla", f_xla)):
        ms = _time_fn(fn, wave)
        fl, by = _flops_bytes(fn, wave)
        out[name] = _entry(name, ms, fl, by, peak_f, peak_b)

    # ---- conv2d at the flagship shape, flagship minibatch
    cfg = ConvnetConfig()
    conv = Conv2DComponent(cfg.in_t, cfg.in_f, cfg.in_c, cfg.filt_t,
                           cfg.filt_f, cfg.num_filters)
    p = conv.init(jax.random.PRNGKey(0))
    B = MINIBATCH
    x = jnp.asarray(rng.normal(size=(B, conv.input_dim)), jnp.float32)
    conv_flops = 2.0 * B * conv.num_patches * conv.patch_dim \
        * conv.num_filters
    c_xla = jax.jit(lambda x: conv.forward(p, x)[0])
    for name, fn in (("conv_xla", c_xla),):
        ms = _time_fn(fn, x)
        fl, by = _flops_bytes(fn, x)
        out[name] = _entry(name, ms, fl or conv_flops, by, peak_f, peak_b)

    # ---- conv + 3-D maxpool: XLA unfused chain vs the implicit-GEMM
    # Pallas kernel that assembles patches in VMEM (the shipped
    # inference path; earlier HBM-materialized Pallas generations lost
    # to XLA and were removed in round 5)
    from kaldi_cnn_tpu.ops.conv_pallas import conv2d_maxpool_implicit
    pool = Maxpooling3DComponent(conv.out_t, conv.out_f,
                                 conv.num_filters, cfg.pool_t,
                                 cfg.pool_f, cfg.pool_c)
    cp_xla = jax.jit(lambda x: pool.forward({}, conv.forward(p, x)[0])[0])
    cp_imp = jax.jit(lambda x: conv2d_maxpool_implicit(
        x, p["w"], p["b"], conv, cfg.pool_t, cfg.pool_f))
    # correctness gate before timing (flagship shape runs compiled
    # here; unit tests cover it in interpret mode at small shapes)
    ref_small = cp_xla(x[:64])
    imp_small = cp_imp(x[:64])
    err = float(jnp.max(jnp.abs(ref_small - imp_small)))
    scale = float(jnp.max(jnp.abs(ref_small))) + 1e-6
    assert err / scale < 0.02, f"implicit kernel mismatch: {err}"
    for name, fn in (("conv_maxpool_xla", cp_xla),
                     ("conv_maxpool_implicit", cp_imp)):
        ms = _time_fn(fn, x)
        fl, by = _flops_bytes(fn, x)
        out[name] = _entry(name, ms, fl or conv_flops, by, peak_f, peak_b)
    return out


def decode_bench() -> dict:
    """Batched TPU decode RTF at >=1M-arc graph scale vs the host
    decoder (ref: nnet-latgen-faster per-utterance RTF logging;
    VERDICT round-2 item 1 + round-3 item 3 'done' bars).  Three rows:
    best-path (the align/endpointing path), raw lattice, and the
    SHIPPED production path (decode_utterances: bucketed batching +
    on-device lattice emission + host word-level determinization) over
    mixed-length utterances."""
    from kaldi_cnn_tpu.decode.biggraph import make_big_graph, \
        sample_loglikes
    from kaldi_cnn_tpu.decode.decoder import lattice_decode
    from kaldi_cnn_tpu.decode.topk_decoder import (TpuTopKDecoder,
                                                   decode_utterances)
    P = 256
    g = make_big_graph(num_words=90_000, num_pdfs=P, min_len=4,
                       max_len=8, seed=3)
    B, T = 16, 200
    lls = [sample_loglikes(g, P, T=T, seed=s) for s in range(B)]
    audio_s = B * T / FRAMES_PER_SECOND
    out = {"graph_states": g.num_states,
           "graph_arcs": int(g.num_emitting_arcs + g.num_eps_arcs)}
    # reference decode settings (steps/nnet2/decode.sh: --beam 15
    # --lattice-beam 8 --max-active 7000; SURVEY.md §3.4).
    # lattice_arcs_per_frame=None: derived from max_active
    # (_derive_lattice_arcs -> 16384 at K=7000), sized so the COLD
    # decode pays zero auto-grow re-decodes/re-compiles.
    dec = TpuTopKDecoder(g, beam=15.0, max_active=7000,
                         acoustic_scale=1.0, lattice_beam=8.0,
                         lattice_arcs_per_frame=None)
    out["lattice_arcs_per_frame"] = int(dec.A_lat)
    dec.decode_batch(lls)                      # compile
    t0 = time.perf_counter()
    dec.decode_batch(lls)
    best_s = time.perf_counter() - t0
    out["tpu_best_path"] = {"s": round(best_s, 3),
                            "rtf": round(best_s / audio_s, 4),
                            "audio_s": audio_s}
    # cold = first lattice decode ever on this decoder: includes jit
    # compilation and any buffer growth re-decodes (there must be none
    # at the derived default sizing)
    t0 = time.perf_counter()
    dec.decode_batch_lattice(lls, determinize=False)
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lats = dec.decode_batch_lattice(lls, determinize=False)
    lat_s = time.perf_counter() - t0
    dropped, oframes = dec.last_overflow
    out["tpu_lattice"] = {"s": round(lat_s, 3),
                          "rtf": round(lat_s / audio_s, 4),
                          "cold_s": round(cold_s, 3),
                          "cold_rtf": round(cold_s / audio_s, 4),
                          "overflow_arcs_dropped": int(dropped),
                          "arcs": int(sum(l.num_arcs for l in lats))}
    # the SHIPPED path: keyed mixed-length utterances through
    # decode_utterances with determinization ON (its default), so the
    # bench measures what recipes/latgen-faster actually run
    mixed = {f"utt{i:02d}": sample_loglikes(
        g, P, T=(100 if i % 2 else 200), seed=100 + i)
        for i in range(2 * B)}     # 16 per length bucket = full batches
    mixed_audio_s = sum(x.shape[0] for x in mixed.values()) \
        / FRAMES_PER_SECOND
    decode_utterances(g, mixed, acoustic_scale=1.0, beam=15.0,
                      lattice_beam=8.0, max_active=7000,
                      decoder=dec)             # compile (both buckets)
    t0 = time.perf_counter()
    shipped = decode_utterances(g, mixed, acoustic_scale=1.0,
                                beam=15.0, lattice_beam=8.0,
                                max_active=7000, decoder=dec)
    ship_s = time.perf_counter() - t0
    out["tpu_lattice_determinized"] = {
        "s": round(ship_s, 3),
        "rtf": round(ship_s / mixed_audio_s, 4),
        "audio_s": mixed_audio_s,
        "utts": len(shipped)}
    # streaming decode: a 64 s stream fed in 320 ms chunks through
    # TpuStreamingDecoder at the same reference settings (ref: the
    # online2 pipeline's per-utterance RTF logging, SURVEY.md §3.5);
    # scan-block jits dispatch once per chunk, the committed-prefix
    # machinery bounds the host window
    from kaldi_cnn_tpu.decode.topk_decoder import TpuStreamingDecoder
    sdec = TpuStreamingDecoder(dec, commit_every=24)
    prime = sample_loglikes(g, P, T=48, seed=9)
    sdec.advance(prime[:33])       # compiles the 32-frame scan block
    sdec.advance(prime[33:42])     # the 8-block
    sdec.advance(prime[42:44])     # the 1-block
    sdec.finalize()
    sdec.reset()
    T_s = 6400
    ll_s = sample_loglikes(g, P, T=T_s, seed=11)
    max_window = 0
    t0 = time.perf_counter()
    for i in range(0, T_s, 32):
        sdec.advance(ll_s[i:i + 32])
        max_window = max(max_window, len(sdec._buf))
    sdec.finalize()
    _, words_s, _ = sdec.best_path()
    stream_s = time.perf_counter() - t0
    import resource
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    out["tpu_streaming"] = {
        "s": round(stream_s, 3), "audio_s": T_s / FRAMES_PER_SECOND,
        "rtf": round(stream_s / (T_s / FRAMES_PER_SECOND), 4),
        "max_window_levels": int(max_window),
        "words": int(len(words_s)),
        "host_rss_mb": round(rss_mb, 0)}

    # host decoder (serial python) on 3 utterances — still a sample of
    # the 16-utt batch the TPU rows decode, but no longer a
    # single-utterance extrapolation
    n_host = 3
    t0 = time.perf_counter()
    for i in range(n_host):
        lattice_decode(g, lls[i], acoustic_scale=1.0, beam=15.0,
                       lattice_beam=8.0, max_active=7000)
    host_s = time.perf_counter() - t0
    host_rtf = host_s / (n_host * T / FRAMES_PER_SECOND)
    out["host_lattice"] = {
        "s": round(host_s, 3), "utts": n_host,
        "rtf": round(host_rtf, 4),
        "sampled_from_batch": True}
    out["tpu_vs_host_speedup"] = round(host_rtf / (lat_s / audio_s), 2)
    return out


def main() -> None:
    on_tpu = jax.default_backend() not in ("cpu",)
    net = make_convnet(ConvnetConfig())
    params = net.init(jax.random.PRNGKey(0))
    opt = net.init_opt()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(MINIBATCH, net.input_dim)),
                    jnp.float32)
    labels = jnp.asarray(rng.integers(0, net.output_dim, MINIBATCH),
                         jnp.int32)
    lr = 0.01
    # Sync via device_get, NOT jax.block_until_ready: on the axon
    # tunnel plugin block_until_ready returns before execution finishes
    # (measured: 50 chained steps "complete" in 15 ms of dispatch but
    # device_get of the same value takes the true 1.7 s), which would
    # inflate throughput ~50x.  device_get(objf) forces the whole
    # dependency chain.
    for _ in range(WARMUP):
        params, opt, objf = net.train_step(params, opt, x, labels, lr)
    jax.device_get(objf)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt, objf = net.train_step(params, opt, x, labels, lr)
    jax.device_get(objf)
    dt = time.perf_counter() - t0
    frames_per_s = STEPS * MINIBATCH / dt
    audio_ss = frames_per_s / FRAMES_PER_SECOND

    # train-step MFU: XLA's flop count for one step / measured time,
    # with an analytic fallback (3x forward matmul flops: fwd + dx +
    # dw; NG preconditioner terms excluded) so MFU is always reported
    peak_f, peak_b = _peaks()
    step_ms = dt / STEPS
    fl, by = _flops_bytes(jax.jit(net.train_step), params, opt, x,
                          labels, lr)
    analytic = fl is None
    if analytic:
        fwd = 0
        for c in net.components:
            if hasattr(c, "num_patches"):
                fwd += 2 * MINIBATCH * c.num_patches * c.patch_dim \
                    * c.num_filters
            elif getattr(c, "trainable", False) and \
                    hasattr(c, "output_dim"):
                fwd += 2 * MINIBATCH * c.input_dim * c.output_dim
        fl = 3 * fwd
    e_step = _entry("train_step", step_ms, fl, by, peak_f, peak_b)
    if analytic:
        e_step["flops_analytic"] = True
    rl = {"train_step": e_step}
    try:
        rl.update(roofline())
    except Exception as e:  # roofline must never sink the headline metric
        rl["error"] = f"{type(e).__name__}: {e}"
    try:
        rl["decode"] = decode_bench()
    except Exception as e:
        rl["decode"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "train_audio_seconds_per_sec_per_chip"
                  + ("" if on_tpu else "_CPU"),
        "value": round(audio_ss, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(audio_ss / BASELINE_AUDIO_SS, 3),
        "roofline": rl,
    }))


if __name__ == "__main__":
    main()
