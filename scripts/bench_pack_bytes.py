"""Packed vocoder weight HBM bytes per serving format.

Round-2 verdict, Weak #2: the load-time packed stage weights were fp32, and
the packed (shifts, gC, gC) shift matrices are strictly LARGER than the raw
(k, C, C) conv weights — the default TPU path paid MORE weight HBM traffic
than XLA fp32.  This script prints the ledger for the MMS-TTS flagship shape
(raw vs packed, per format) and can append it to BENCH_DETAIL.json.

Run (CPU is fine — it's just array packing):
    JAX_PLATFORMS=cpu python scripts/bench_pack_bytes.py [--update-detail]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import PACK_PREFIX, precompute_vocoder_packs

    config = VitsConfig()
    params = random_params(config, seed=0, keep_training=False)

    raw_bytes = sum(
        np.asarray(v).nbytes for k, v in params.items()
        if k.startswith("decoder.") and k.endswith(".weight")
    )

    ledger = {"raw_decoder_weight_bytes_fp32": raw_bytes}
    for fmt in ("float32", "bfloat16", "int8"):
        packs = precompute_vocoder_packs(params, config, weight_format=fmt)
        weights = sum(
            np.asarray(v).nbytes for k, v in packs.items()
            if k.split(".")[-1] in ("wu", "w1_all", "w2_all", "wr_all", "wq",
                                    "w1", "w2")
        )
        scales = sum(
            np.asarray(v).nbytes for k, v in packs.items()
            if k.split(".")[-1] in ("su", "s1", "s2", "sq")
        )
        ledger[f"packed_bytes_{fmt}"] = weights
        if scales:
            ledger[f"packed_bytes_{fmt}_scales"] = scales
        print(f"{fmt:>9}: packed {weights / 1e6:7.2f} MB"
              + (f" + {scales / 1e3:.1f} KB scales" if scales else "")
              + f"  ({weights / raw_bytes:.2f}x raw fp32 decoder weights)")
    print(f"  raw fp32 decoder weights: {raw_bytes / 1e6:.2f} MB")

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["vocoder_pack_bytes"] = {
            "note": ("HBM bytes of the fused-kernel vocoder weight packs per "
                     "serving format (MMS flagship shape).  Round 2 shipped "
                     "fp32 packs (the 'float32' row) — larger than the raw "
                     "weights; bf16 is the round-3 default, int8 auto-selects "
                     "for quantized checkpoints."),
            **ledger,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
