"""Device-time profile of one synthesis dispatch, from the XLA profiler trace.

Wall-clock timing through this environment's tunneled TPU is unreliable for
microbenchmarks: ``block_until_ready`` returns at RPC ack, not device
completion, so only real ``device_get`` fetches synchronize (BENCH_DETAIL
``measurement_methodology``).  The profiler's device lane is the ground
truth.  This captures ONE full-pipeline dispatch and prints:

  * total device time (XLA Modules lane) -> on-chip xRT at capacity
  * per-op-category breakdown (XLA Ops lane)
  * each Pallas kernel invocation with its duration

Usage: python scripts/profile_device.py [--tokens 512] [--frames 1024]
       [--no-pallas] [--update-detail]
"""

import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

from vits_tpu.utils.devprofile import parse_trace


def capture(tokens, frames, use_pallas, use_attention, batch=1,
            value_dtype="bfloat16", weight_format=None):
    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.vits import synthesize

    config = VitsConfig()
    params = random_params(config, keep_training=False)
    if use_pallas:
        # mirror the engine's load path: packed vocoder weights in the
        # serving weight format (Synthesizer.__init__)
        from vits_tpu.models.hifigan import precompute_vocoder_packs

        if weight_format is None:
            weight_format = value_dtype
        params.update(precompute_vocoder_packs(
            params, config, weight_format=weight_format))
    params = {k: jnp.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (batch, tokens)), jnp.int32)
    mask = jnp.ones((batch, tokens), jnp.float32)
    key = jax.random.PRNGKey(0)

    vd = None if value_dtype == "float32" else value_dtype
    fn = jax.jit(lambda i, m, k: synthesize(
        params, config, i, m, frames, rng=k,
        use_pallas=use_pallas, use_pallas_attention=use_attention,
        pallas_value_dtype=vd).waveform)
    # warm (compile) with a REAL fetch so the device is quiesced
    np.asarray(fn(ids, mask, key)).sum()

    tmp = tempfile.mkdtemp(prefix="devtrace_")
    with jax.profiler.trace(tmp):
        np.asarray(fn(ids, mask, key)).sum()
    return tmp, config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-attention", action="store_true")
    ap.add_argument("--update-detail", action="store_true")
    ap.add_argument("--value-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"),
                    help="kernel VMEM value dtype (engine default: bfloat16)")
    ap.add_argument("--weight-format", default=None,
                    choices=(None, "float32", "bfloat16", "int8"),
                    help="packed-weight format (default: follow value dtype)")
    args = ap.parse_args()

    tmp, config = capture(args.tokens, args.frames,
                          not args.no_pallas, not args.no_attention,
                          batch=args.batch, value_dtype=args.value_dtype,
                          weight_format=args.weight_format)
    module_ms, cat, pallas = parse_trace(tmp)

    audio_s = args.batch * args.frames * config.total_upsample / config.sampling_rate
    print(f"device time (one dispatch): {module_ms:.3f} ms  "
          f"-> on-chip capacity xRT {audio_s / (module_ms / 1e3):.0f}x")
    print("\nper-category device ms:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:8.3f}  {k[:80]}")
    print("\npallas kernel invocations:")
    for name, ms in sorted(pallas, key=lambda kv: -kv[1]):
        print(f"  {ms:8.3f}  {name[:80]}")

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["device_profile"] = {
            "note": ("XLA-profiler device-lane times for ONE full dispatch "
                     "(tokens=%d frames=%d) — the authoritative on-chip "
                     "numbers; wall-clock microbenches through the tunnel "
                     "are unreliable (see measurement_methodology)"
                     % (args.tokens, args.frames)),
            "module_ms": round(module_ms, 3),
            "onchip_capacity_xrt": round(audio_s / (module_ms / 1e3), 1),
            "categories_ms": {k: round(v, 3) for k, v in
                              sorted(cat.items(), key=lambda kv: -kv[1])[:12]},
            "pallas_invocations_ms": [
                {"name": n[:60], "ms": round(ms, 3)}
                for n, ms in sorted(pallas, key=lambda kv: -kv[1])],
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("\nBENCH_DETAIL.json updated")


if __name__ == "__main__":
    main()
