"""Device-lane cost of the user-facing fidelity tiers.

Measures what each ``EngineConfig.fidelity_kwargs`` tier costs on the chip
(XLA-profiler device lane, best of N — the tunnel-independent ground truth,
see vits_tpu/utils/devprofile.py) at the bench shape, mirroring exactly how
the engine resolves tier kwargs into kernel arguments
(engine/synthesizer.py::__init__ value-dtype/weight-format auto rules).

    python scripts/bench_fidelity_tiers.py [--update-detail] [--reps 3]

With --update-detail the per-tier device ms is merged into BENCH_DETAIL.json
``fidelity_tiers_r4`` next to the mel-L1 columns from
``value_dtype_fidelity_trained`` (scripts/bench_value_dtype.py --ggml).
The reference has no fidelity tiers to compare against — its one precision
policy is fp16 conv weights (/root/reference/scripts/export_vits.py:87).
"""

import argparse
import contextlib
import json
import sys

sys.path.insert(0, ".")

import numpy as np


# tier -> synthesize() kwargs, resolved the way the engine resolves
# EngineConfig.fidelity_kwargs (precision in ("high","highest") => fp32
# values + fp32 packed weights; glue via jax.default_matmul_precision).
TIERS = {
    "fast": dict(precision=None, value_dtype="bfloat16",
                 weight_format="bfloat16", glue=None),
    "glue32": dict(precision=None, value_dtype="bfloat16",
                   weight_format="bfloat16", glue="highest"),
    "high": dict(precision="high", value_dtype="float32",
                 weight_format="float32", glue="highest"),
    "exact": dict(precision="highest", value_dtype="float32",
                  weight_format="float32", glue="highest"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import precompute_vocoder_packs
    from vits_tpu.models.vits import synthesize
    from vits_tpu.utils.devprofile import device_ms

    config = VitsConfig()
    base = random_params(config, seed=0, keep_training=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (1, args.tokens)),
                      jnp.int32)
    mask = jnp.ones((1, args.tokens), jnp.float32)
    key = jax.random.PRNGKey(0)

    rows = {}
    for tier, kw in TIERS.items():
        params = dict(base)
        params.update(precompute_vocoder_packs(
            params, config, weight_format=kw["weight_format"]))
        params = {k: jnp.asarray(v) for k, v in params.items()}
        ctx = (jax.default_matmul_precision(kw["glue"])
               if kw["glue"] else contextlib.nullcontext())
        with ctx:
            fn = jax.jit(lambda i, m, k: synthesize(
                params, config, i, m, args.frames, rng=k,
                use_pallas=True, pallas_value_dtype=kw["value_dtype"],
                pallas_precision=kw["precision"]).waveform)
            run = lambda: np.asarray(fn(ids, mask, key)).sum()
            run()  # compile + quiesce
            best = min(device_ms(run) for _ in range(args.reps))
        rows[tier] = round(best, 3)
        print(f"{tier}: {rows[tier]} ms/dispatch (device lane, best of "
              f"{args.reps})")

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        entry = detail.setdefault("fidelity_tiers_r4", {})
        fid = detail.get("value_dtype_fidelity_trained", {})
        mel = {"fast": "pallas_bf16_glue32", "glue32": "pallas_bf16_glue32",
               "high": "pallas_high_glue32", "exact": "pallas_highest_glue32"}
        for tier, ms in rows.items():
            entry.setdefault(tier, {})["device_ms_per_dispatch"] = ms
            src = fid.get(mel[tier], {})
            if "mel_l1_vs_xla" in src:
                entry[tier]["mel_l1_alignment_pinned"] = src["mel_l1_vs_xla"]
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
