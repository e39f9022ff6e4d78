"""Per-vocoder-stage precision frontier: mel-L1 vs device cost (round-5).

The uniform ``exact`` tier (6-pass fp32 multiplies in EVERY vocoder stage)
costs 32 ms/dispatch for <1e-3 mel-L1; the uniform ``high`` (3-pass) tier is
half that.  But single-pass bf16 error is not uniform across the four
vocoder stages — this measures, on TRAINED weights:

  1. leave-one-out attribution: all stages at 6-pass except stage s at fast
     — the residual mel-L1 is stage s's own contribution;
  2. candidate mixed specs (ops/precision.py comma form), walking the
     mel-L1/ms frontier toward the cheapest <1e-3 point.

    python scripts/study_stage_precision.py --ggml /tmp/convergence_trained.ggml \
        [--update-detail]

Alignment is pinned (glue32: XLA fp32 matmuls) and values/weights ride fp32
for every non-fast row, so ONLY the kernels' multiply pass-count varies —
the same isolation as BENCH_DETAIL ``value_dtype_fidelity_trained``.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ggml", required=True)
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.io import loader
    from vits_tpu.models.hifigan import precompute_vocoder_packs
    from vits_tpu.models.vits import synthesize
    from vits_tpu.utils.devprofile import device_ms
    from vits_tpu.utils.mel import log_mel_spectrogram

    config, _, base = loader.load_ggml(args.ggml)
    base = {k: np.asarray(v) for k, v in base.items()}
    n_stages = len(config.upsample_rates)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (1, args.tokens)),
                      jnp.int32)
    mask = jnp.ones((1, args.tokens), jnp.float32)
    key = jax.random.PRNGKey(0)

    def mel_l1(a, b):
        ma = np.asarray(log_mel_spectrogram(a[None], sample_rate=config.sampling_rate))
        mb = np.asarray(log_mel_spectrogram(b[None], sample_rate=config.sampling_rate))
        return float(np.mean(np.abs(ma - mb)))

    def run(spec, fast_values=False, measure_ms=False):
        """One serving point: glue32 + fp32 values/weights (unless fast)."""
        params = dict(base)
        params.update(precompute_vocoder_packs(
            params, config,
            weight_format="bfloat16" if fast_values else "float32"))
        params = {k: jnp.asarray(v) for k, v in params.items()}
        with jax.default_matmul_precision("highest"):
            fn = jax.jit(lambda i, m, k: synthesize(
                params, config, i, m, args.frames, rng=k,
                use_pallas=True,
                pallas_value_dtype="bfloat16" if fast_values else "float32",
                pallas_precision=spec).waveform)
            wave = np.asarray(fn(ids, mask, key))[0]
            ms = None
            if measure_ms:
                go = lambda: np.asarray(fn(ids, mask, key)).sum()
                go()
                ms = min(device_ms(go) for _ in range(args.reps))
        return wave, ms

    # Oracle: the fp32-multiply XLA path, same as the fidelity table.
    with jax.default_matmul_precision("highest"):
        params = {k: jnp.asarray(v) for k, v in base.items()}
        oracle = np.asarray(jax.jit(lambda i, m, k: synthesize(
            params, config, i, m, args.frames, rng=k,
            use_pallas=False).waveform)(ids, mask, key))[0]

    rows = {}

    def record(label, spec, fast_values=False, measure_ms=True):
        wave, ms = run(spec, fast_values=fast_values, measure_ms=measure_ms)
        rows[label] = {
            "spec": spec if spec is not None else "fast",
            "mel_l1": round(mel_l1(wave, oracle), 7),
        }
        if ms is not None:
            rows[label]["device_ms"] = round(ms, 3)
        print(label, rows[label], flush=True)

    # anchors
    record("uniform_fast_fp32vals", None)
    record("uniform_high", "high")
    record("uniform_highest", "highest")

    # leave-one-out attribution: stage s at fast, the rest at 6-pass
    for s in range(n_stages):
        spec = ",".join("" if i == s else "highest" for i in range(n_stages))
        record(f"loo_stage{s}_fast", spec, measure_ms=False)

    # only-one: stage s at 6-pass, the rest fast (complementary view)
    for s in range(n_stages):
        spec = ",".join("highest" if i == s else "" for i in range(n_stages))
        record(f"only_stage{s}_highest", spec, measure_ms=False)

    # candidate mixed tiers along the expected frontier
    for label, spec in (
        ("mixed_tail_highest", ",".join(
            ("" if i < n_stages - 2 else "highest") for i in range(n_stages))),
        ("mixed_high_tail_highest", ",".join(
            ("high" if i < n_stages - 2 else "highest") for i in range(n_stages))),
        ("mixed_head_highest", ",".join(
            ("highest" if i < n_stages - 2 else "") for i in range(n_stages))),
        ("mixed_high_head_highest", ",".join(
            ("highest" if i < n_stages - 2 else "high") for i in range(n_stages))),
    ):
        record(label, spec)

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["stage_precision_r5"] = {
            "note": ("Per-vocoder-stage multiply-precision frontier on "
                     "TRAINED weights (%s; tokens=%d frames=%d).  Oracle = "
                     "XLA fp32 multiplies; glue32 + fp32 values/weights on "
                     "every row, only the kernels' pass-count varies.  "
                     "loo_* rows attribute single-pass bf16 error to one "
                     "stage each (that stage fast, others 6-pass); mixed_* "
                     "rows are candidate serving tiers (ops/precision.py "
                     "comma specs)." % (args.ggml, args.tokens, args.frames)),
            **rows,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
