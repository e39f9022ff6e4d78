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
    ap.add_argument("--ggml", default=None,
                    help="measure on this checkpoint's (trained) weights "
                         "instead of random MMS-shaped ones; with "
                         "--update-detail the entry is recorded under "
                         "value_dtype_fidelity_trained")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import precompute_vocoder_packs
    from vits_tpu.models.vits import synthesize

    if args.ggml:
        from vits_tpu.io import loader

        config, _, base = loader.load_ggml(args.ggml)
        base = {k: np.asarray(v) for k, v in base.items()}
    else:
        config = VitsConfig()
        base = random_params(config, seed=0, keep_training=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (1, args.tokens)), jnp.int32)
    mask = jnp.ones((1, args.tokens), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(use_pallas, value_dtype=None, weight_format=None, precision=None,
            xla_precision=None):
        params = dict(base)
        if use_pallas:
            params.update(precompute_vocoder_packs(
                params, config,
                weight_format=weight_format or value_dtype or "float32"))
        params = {k: jnp.asarray(v) for k, v in params.items()}
        import contextlib

        ctx = (jax.default_matmul_precision(xla_precision)
               if xla_precision else contextlib.nullcontext())
        with ctx:
            out = jax.jit(lambda i, m, k: synthesize(
                params, config, i, m, args.frames, rng=k,
                use_pallas=use_pallas, pallas_value_dtype=value_dtype,
                pallas_precision=precision).waveform)(ids, mask, key)
        return np.asarray(out)[0]

    def _voiced_mel_l1(a, b, rate):
        # restrict to frames whose oracle log-mel is above the near-silence
        # band: the plain mean is dominated by log-amplified noise in frames
        # that are audibly silent (log(1e-4 +- 3e-6) swings ~0.03)
        from vits_tpu.utils.mel import log_mel_spectrogram

        ma = np.asarray(log_mel_spectrogram(a[None], sample_rate=rate))[0]
        mb = np.asarray(log_mel_spectrogram(b[None], sample_rate=rate))[0]
        voiced = ma.max(-1) > ma.max() - 8.0  # frames within e^-8 of peak
        if not voiced.any():
            return None
        return float(np.mean(np.abs(ma[voiced] - mb[voiced])))

    # The fidelity oracle is XLA at fp32 ("highest") multiplies.  XLA's own
    # DEFAULT TPU precision does bf16 multiplies in every conv, so it is a
    # serving point to measure, not a reference to measure against.
    xla = run(False, xla_precision="highest")
    rows = {}
    for label, kwargs in (
        ("xla_default", dict(use_pallas=False)),
        ("pallas_highest_fp32", dict(use_pallas=True, precision="highest",
                                     weight_format="float32")),
        ("pallas_fp32", dict(use_pallas=True, value_dtype=None,
                             weight_format="float32")),
        ("pallas_bf16", dict(use_pallas=True, value_dtype="bfloat16")),
        ("pallas_int8_bf16", dict(use_pallas=True, value_dtype="bfloat16",
                                  weight_format="int8")),
        # glue32 rows: encoder/duration/flow ("glue") matmuls forced to fp32
        # via jax.default_matmul_precision, isolating the vocoder kernels'
        # contribution — and measuring the candidate serving point where the
        # cheap non-vocoder modules run exact and the FLOP-heavy vocoder
        # stays bf16-value (EngineConfig.matmul_precision).
        ("pallas_bf16_glue32", dict(use_pallas=True, value_dtype="bfloat16",
                                    xla_precision="highest")),
        ("pallas_fp32_glue32", dict(use_pallas=True, value_dtype="float32",
                                    weight_format="float32",
                                    xla_precision="highest")),
        ("pallas_int8_glue32", dict(use_pallas=True, value_dtype="bfloat16",
                                    weight_format="int8",
                                    xla_precision="highest")),
        ("pallas_highest_glue32", dict(use_pallas=True, precision="highest",
                                       weight_format="float32",
                                       xla_precision="highest")),
        # 3-pass bf16 multiplies (Precision.HIGH): the candidate cheaper
        # exact tier — half the multiply passes of "highest", possibly
        # already under the 1e-3 mel-L1 target.
        ("pallas_high_glue32", dict(use_pallas=True, precision="high",
                                    weight_format="float32",
                                    xla_precision="highest")),
    ):
        wave = run(**kwargs)
        rows[label] = {
            "mel_l1_vs_xla": round(_mel_l1(wave, xla, config.sampling_rate), 6),
            "mel_l1_voiced": (lambda v: None if v is None else round(v, 6))(
                _voiced_mel_l1(wave, xla, config.sampling_rate)),
            "wave_l1_vs_xla": round(float(np.mean(np.abs(wave - xla))), 7),
            "wave_linf_vs_xla": round(float(np.max(np.abs(wave - xla))), 6),
        }
        print(label, rows[label])

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        if args.ggml:
            key = "value_dtype_fidelity_trained"
            src = "TRAINED weights (%s)" % args.ggml
        else:
            key = "value_dtype_fidelity"
            src = "random MMS-shaped weights"
        detail[key] = {
            "note": ("Output fidelity of the fused-kernel value-dtype/weight-"
                     "format serving points vs the XLA fp32 oracle at the "
                     "bench shape (tokens=%d frames=%d, %s).  bf16 "
                     "values are the round-3 default; mel-L1 target from "
                     "BASELINE.md is < 1e-3." % (args.tokens, args.frames, src)),
            **rows,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
