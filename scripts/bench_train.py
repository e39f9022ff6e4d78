"""Training-step throughput: full adversarial (GAN) VITS step on the chip.

Measures steady-state step time, examples/sec and audio-seconds-trained/sec
for the production ``make_gan_train_step`` at MMS-eng full width, plus a
generator-only step for comparison.  The training analogue of bench.py:
the reference has no trainer at all (SURVEY §5 — training happens in HF
torch, offline), so these numbers have no reference baseline; they are the
regression guard for our own training stack.

Usage: python scripts/bench_train.py [--batch 8] [--frames 128] [--steps 12]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--update-detail", action="store_true")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable the custom-VJP fused trio in the generator "
                         "forward (round-3 default: on for TPU)")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="compute dtype for the model math (masters stay fp32)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatches per optimizer update")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.discriminator import init_discriminator_params
    from vits_tpu.train.step import TrainBatch, make_gan_train_step, make_train_step

    config = VitsConfig()
    gen_params = {k: jnp.asarray(v) for k, v in
                  random_params(config, seed=0, keep_training=True).items()}
    disc_params = {k: jnp.asarray(v) for k, v in
                   init_discriminator_params(1).items()}

    B, T, S = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        input_ids=jnp.asarray(rng.integers(1, config.vocab_size, (B, T)), jnp.int32),
        token_mask=jnp.ones((B, T), jnp.float32),
        spectrogram=jnp.asarray(
            rng.standard_normal((B, S, config.spectrogram_bins)) * 0.1, jnp.float32),
        frame_mask=jnp.ones((B, S), jnp.float32),
        audio=jnp.asarray(
            rng.standard_normal((B, S * config.total_upsample)) * 0.1, jnp.float32),
    )
    key = jax.random.PRNGKey(0)

    gen_opt = optax.adamw(2e-4)
    disc_opt = optax.adamw(2e-4)

    results = {"shape": {"batch": B, "tokens": T, "frames": S},
               "compute_dtype": args.dtype, "grad_accum": args.grad_accum}

    def timed(step_fn, carry_init, n):
        carry = carry_init()
        # a REAL device_get: through the tunneled TPU, block_until_ready
        # returns at RPC ack, not device completion (BENCH_DETAIL
        # measurement_methodology) — only fetches synchronize.
        np.asarray(jax.tree.leaves(carry[-1])[0])
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step_fn(carry)
        np.asarray(jax.tree.leaves(carry[-1])[0])
        return (time.perf_counter() - t0) / n * 1000

    use_pallas = False if args.no_pallas else None  # None = auto
    from vits_tpu.train.step import _resolve_use_pallas

    # Report what the train step will ACTUALLY resolve (single-chip TPU
    # only), not a backend check — on multi-chip the kernels stay off.
    results["use_pallas"] = bool(_resolve_use_pallas(use_pallas))

    # generator-only step
    g_step = make_train_step(config, gen_opt, donate=False, use_pallas=use_pallas,
                             compute_dtype=args.dtype, grad_accum=args.grad_accum)
    g_opt_state = gen_opt.init(gen_params)

    def g_init():
        return g_step(gen_params, g_opt_state, batch, key)

    def g_run(carry):
        p, o, m = carry
        return g_step(p, o, batch, key)

    results["gen_step_ms"] = round(timed(g_run, g_init, args.steps), 2)

    # full GAN step (single generator forward via vjp pullback)
    gan_step = make_gan_train_step(config, gen_opt, disc_opt, donate=False,
                                   use_pallas=use_pallas,
                                   compute_dtype=args.dtype,
                                   grad_accum=args.grad_accum)
    gp_state = gen_opt.init(gen_params)
    dp_state = disc_opt.init(disc_params)

    def gan_init():
        return gan_step(gen_params, disc_params, gp_state, dp_state, batch, key)

    def gan_run(carry):
        gp, dp, gs, ds, m = carry
        return gan_step(gp, dp, gs, ds, batch, key)

    results["gan_step_ms"] = round(timed(gan_run, gan_init, args.steps), 2)
    sec_per_example = S * config.total_upsample / config.sampling_rate
    results["examples_per_sec"] = round(B / (results["gan_step_ms"] / 1000), 1)
    results["audio_sec_trained_per_sec"] = round(
        B * sec_per_example / (results["gan_step_ms"] / 1000), 1)
    results["backend"] = jax.default_backend()

    print(json.dumps(results, indent=2))
    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["train_step"] = {
            "note": ("full-width MMS-eng adversarial step (D update + G update, one "
                     "generator forward via vjp) on random data; reference has no "
                     "trainer — regression guard for our stack"),
            **results,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")


if __name__ == "__main__":
    main()
