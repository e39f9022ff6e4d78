"""Dispatch-floor-corrected stage breakdown.

profile_stages.py times each stage as its own dispatch, so every number
carries the per-dispatch host->device launch latency (large through the
axon tunnel).  This script separates the two:

  * dispatch floor: a trivial jitted fn, timed — pure launch cost
  * per-stage COMPUTE: the stage body run K times inside ONE jit via
    lax.fori_loop (inputs perturbed by the loop index so XLA cannot hoist
    the body), so launch cost amortizes to ~0
  * full pipeline, XLA vs Pallas vocoder, one-dispatch numbers

Usage: python scripts/profile_breakdown.py [--frames 1024] [--iters 8] [--reps 16]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def wall_ms(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def amortized_ms(body, x0, reps, iters=4):
    """ms per body() application, launch cost amortized over `reps` in-jit runs.

    body: array -> array of the SAME shape (chained through the loop carry,
    perturbed by the index so the compiler cannot hoist it).
    """
    def loop(x):
        def step(i, v):
            return body(v + jnp.float32(1e-30) * i)
        return jax.lax.fori_loop(0, reps, step, x)

    f = jax.jit(loop)
    total = wall_ms(f, x0, iters=iters)
    return total / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
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
    params = {k: jnp.asarray(v) for k, v in
              random_params(config, keep_training=False).items()}
    p = ParamView(params)

    B, T, F = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((B, T, config.hidden_size)), jnp.float32)
    dur_noise = jnp.asarray(rng.standard_normal((B, T, 2)), jnp.float32)
    latents = jnp.asarray(rng.standard_normal((B, F, config.flow_size)), jnp.float32)
    fmask3 = jnp.ones((B, F, 1), jnp.float32)

    out = {"shape": {"batch": B, "tokens": T, "frames": F}}

    # --- dispatch floor ---------------------------------------------------- #
    tiny = jnp.zeros((8, 128), jnp.float32)
    floor_fn = jax.jit(lambda x: x + 1.0)
    out["dispatch_floor_ms"] = round(wall_ms(floor_fn, tiny, iters=32), 3)

    # --- per-stage amortized compute --------------------------------------- #
    # encoder: chain via a float side-channel folded into the mask
    def enc_body(m):
        enc = text_encoder(p, config, ids, m[..., None], m)
        return m + jnp.float32(1e-30) * jnp.sum(enc[0])
    out["encoder_ms"] = round(amortized_ms(enc_body, mask, args.reps, args.iters), 3)

    def sdp_body(h):
        d = stochastic_duration_predictor_reverse(
            p, config, h, mask[..., None], dur_noise, config.noise_scale_duration)
        return h + jnp.float32(1e-30) * jnp.sum(d)
    out["sdp_ms"] = round(amortized_ms(sdp_body, hidden, args.reps, args.iters), 3)

    def flow_body(z):
        y, _ = residual_coupling_block(p, config, z, fmask3, reverse=True)
        return y
    out["flow_ms"] = round(amortized_ms(flow_body, latents, args.reps, args.iters), 3)

    def voc_xla_body(z):
        w = hifigan(p, config, z, fmask3, use_pallas=False)
        return z + jnp.float32(1e-30) * jnp.sum(w)
    out["hifigan_xla_ms"] = round(
        amortized_ms(voc_xla_body, latents, max(2, args.reps // 4), args.iters), 3)

    if jax.default_backend() == "tpu":
        def voc_pl_body(z):
            w = hifigan(p, config, z, fmask3, use_pallas=True)
            return z + jnp.float32(1e-30) * jnp.sum(w)
        out["hifigan_pallas_ms"] = round(
            amortized_ms(voc_pl_body, latents, max(2, args.reps // 4), args.iters), 3)

    # --- larger assemblies, amortized -------------------------------------- #
    from vits_tpu.models.vits import text_to_latents

    key = jax.random.PRNGKey(0)

    def latents_body(m):
        lat = text_to_latents(params, config, ids, m, F, rng=key)
        return m + jnp.float32(1e-30) * jnp.sum(lat.latents)
    out["text_to_latents_ms"] = round(
        amortized_ms(latents_body, mask, max(2, args.reps // 2), args.iters), 3)

    def full_body(m):
        r = synthesize(params, config, ids, m, F, rng=key,
                       use_pallas=jax.default_backend() == "tpu")
        return m + jnp.float32(1e-30) * jnp.sum(r.waveform)
    out["full_amortized_ms"] = round(
        amortized_ms(full_body, mask, max(2, args.reps // 4), args.iters), 3)

    # --- full pipeline, one dispatch (what the engine pays per call) ------- #
    full_xla = jax.jit(lambda i, m, k: synthesize(
        params, config, i, m, F, rng=k, use_pallas=False).waveform)
    out["full_1dispatch_xla_ms"] = round(wall_ms(full_xla, ids, mask, key, iters=args.iters), 3)
    if jax.default_backend() == "tpu":
        full_pl = jax.jit(lambda i, m, k: synthesize(
            params, config, i, m, F, rng=k, use_pallas=True).waveform)
        out["full_1dispatch_pallas_ms"] = round(
            wall_ms(full_pl, ids, mask, key, iters=args.iters), 3)

    audio_capacity_s = B * F * config.total_upsample / config.sampling_rate
    out["audio_capacity_s"] = round(audio_capacity_s, 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
