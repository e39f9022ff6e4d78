"""Kernel value-dtype / weight-format fidelity: mel-L1 + wave-L1 vs fp32.

Round 3 defaults the fused vocoder kernels to bf16 VMEM values (and int8
packed weights for quantized checkpoints).  This measures what that costs in
output fidelity at the bench shape, against the fp32-value pallas path and
the XLA (no-pallas) oracle:

    python scripts/bench_value_dtype.py [--update-detail]

Runs on the default backend (the TPU chip under axon; compiled kernels).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _mel_l1(a, b, rate):
    from vits_tpu.utils.mel import log_mel_spectrogram

    ma = np.asarray(log_mel_spectrogram(a[None], sample_rate=rate))
    mb = np.asarray(log_mel_spectrogram(b[None], sample_rate=rate))
    return float(np.mean(np.abs(ma - mb)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import precompute_vocoder_packs
    from vits_tpu.models.vits import synthesize

    config = VitsConfig()
    base = random_params(config, seed=0, keep_training=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (1, args.tokens)), jnp.int32)
    mask = jnp.ones((1, args.tokens), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(use_pallas, value_dtype=None, weight_format=None):
        params = dict(base)
        if use_pallas:
            params.update(precompute_vocoder_packs(
                params, config,
                weight_format=weight_format or value_dtype or "float32"))
        params = {k: jnp.asarray(v) for k, v in params.items()}
        out = jax.jit(lambda i, m, k: synthesize(
            params, config, i, m, args.frames, rng=k, use_pallas=use_pallas,
            pallas_value_dtype=value_dtype).waveform)(ids, mask, key)
        return np.asarray(out)[0]

    xla = run(False)
    rows = {}
    for label, kwargs in (
        ("pallas_fp32", dict(value_dtype=None, weight_format="float32")),
        ("pallas_bf16", dict(value_dtype="bfloat16")),
        ("pallas_int8_bf16", dict(value_dtype="bfloat16", weight_format="int8")),
    ):
        wave = run(True, **kwargs)
        rows[label] = {
            "mel_l1_vs_xla": round(_mel_l1(wave, xla, config.sampling_rate), 6),
            "wave_l1_vs_xla": round(float(np.mean(np.abs(wave - xla))), 7),
            "wave_linf_vs_xla": round(float(np.max(np.abs(wave - xla))), 6),
        }
        print(label, rows[label])

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["value_dtype_fidelity"] = {
            "note": ("Output fidelity of the fused-kernel value-dtype/weight-"
                     "format serving points vs the XLA fp32 oracle at the "
                     "bench shape (tokens=%d frames=%d, random MMS-shaped "
                     "weights).  bf16 values are the round-3 default; mel-L1 "
                     "target from BASELINE.md is < 1e-3." % (args.tokens, args.frames)),
            **rows,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
