"""Stage-level TPU timing: where does synthesis time go?

Times encoder / SDP / flow / hifigan separately plus the fused pipeline, in
fp32 and bf16, at the bench shape (512 tokens / 1024 frames).  The TPU-native
counterpart of the reference's per-graph wall-clock logging (vits.cpp:1117-1125)
and bench_simd kernel shootout.

CAVEAT: through this environment's tunneled TPU, wall-clock numbers carry
per-dispatch RPC latency and block_until_ready does NOT wait for device
completion — use scripts/profile_device.py (XLA profiler device lane) for
authoritative on-chip times (BENCH_DETAIL.json "measurement_methodology").

Usage: python scripts/profile_stages.py [--batch 1] [--dtype float32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args()

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.params import ParamView
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.duration import stochastic_duration_predictor_reverse
    from vits_tpu.models.encoder import text_encoder
    from vits_tpu.models.flow import residual_coupling_block
    from vits_tpu.models.hifigan import hifigan
    from vits_tpu.models.vits import synthesize

    config = VitsConfig()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = {k: jnp.asarray(v).astype(dtype) if v.dtype == np.float32 else jnp.asarray(v)
              for k, v in random_params(config, keep_training=False).items()}

    B, T, F = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    ids = rng.integers(1, config.vocab_size, (B, T)).astype(np.int32)
    mask = jnp.ones((B, T), dtype)
    mask3 = mask[..., None]
    hidden = jnp.asarray(rng.standard_normal((B, T, config.hidden_size)), dtype)
    dur_noise = jnp.asarray(rng.standard_normal((B, T, 2)), dtype)
    latents = jnp.asarray(rng.standard_normal((B, F, config.flow_size)), dtype)
    fmask3 = jnp.ones((B, F, 1), dtype)

    p = ParamView(params)
    enc_fn = jax.jit(lambda ids, m: text_encoder(p, config, ids, m[..., None], m))
    sdp_fn = jax.jit(lambda h, m, n: stochastic_duration_predictor_reverse(
        p, config, h, m, n, config.noise_scale_duration))
    flow_fn = jax.jit(lambda z, m: residual_coupling_block(p, config, z, m, reverse=True)[0])
    voc_fn = jax.jit(lambda z, m: hifigan(p, config, z, m))
    full_fn = jax.jit(lambda ids, m, k: synthesize(params, config, ids, m, F, rng=k).waveform)

    results = {}
    results["encoder_ms"] = timeit(enc_fn, ids, mask)
    results["sdp_ms"] = timeit(sdp_fn, hidden, mask3, dur_noise)
    results["flow_ms"] = timeit(flow_fn, latents, fmask3)
    results["hifigan_ms"] = timeit(voc_fn, latents, fmask3)
    results["full_ms"] = timeit(full_fn, ids, mask, jax.random.PRNGKey(0))

    audio_sec = B * F * config.total_upsample / config.sampling_rate
    print(f"batch={B} tokens={T} frames={F} dtype={args.dtype}")
    for k, v in results.items():
        print(f"  {k:>12}: {v:8.2f}")
    print(f"  sum(stages): {sum(v for k, v in results.items() if k != 'full_ms'):8.2f}")
    print(f"  full xRT (capacity audio): {audio_sec / (results['full_ms'] / 1000):.1f}x")


if __name__ == "__main__":
    main()
