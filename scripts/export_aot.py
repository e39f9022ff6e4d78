"""Export an AOT serving bundle (pre-lowered StableHLO programs).

    python scripts/export_aot.py --model vits-eng.ggml --out bundle/ \
        [--batch-sizes 1,2,4,8,16] [--platforms tpu] [--pallas {auto,on,off}]

Then serve trace-free:

    python -m vits_tpu.engine.server --model vits-eng.ggml --aot-bundle bundle/

``--platforms tpu`` cross-lowers TPU programs (Mosaic kernels included) from
a CPU-only machine; in that case pass ``--pallas on`` so the kernel selection
matches the serving backend (auto-resolution follows the EXPORT host's
backend and the bundle is option-fingerprinted at load).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help=".ggml path or HF dir/name")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--batch-sizes", default="1",
                    help="comma-separated batch sizes to export")
    ap.add_argument("--token-buckets", default=None,
                    help="comma-separated token buckets (default: engine's)")
    ap.add_argument("--frames-per-token", type=float, default=None)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated jax.export platforms, e.g. 'tpu'")
    ap.add_argument("--pallas", choices=("auto", "on", "off"), default="auto",
                    help="fused-kernel selection baked into the programs")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="float32")
    args = ap.parse_args(argv)

    import vits_tpu
    from vits_tpu.config import EngineConfig
    from vits_tpu.io.aot import export_bundle

    kw = {"compute_dtype": args.dtype}
    if args.token_buckets:
        kw["token_buckets"] = tuple(
            int(b) for b in args.token_buckets.split(","))
    if args.frames_per_token is not None:
        kw["frames_per_token"] = args.frames_per_token
    if args.pallas != "auto":
        on = args.pallas == "on"
        kw["use_pallas_vocoder"] = on
        kw["use_pallas_attention"] = on

    model = vits_tpu.load_model(args.model, EngineConfig(**kw))
    manifest = export_bundle(
        model, args.out,
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")),
        platforms=args.platforms.split(",") if args.platforms else None,
    )
    total = sum(
        os.path.getsize(os.path.join(args.out, e["file"]))
        for e in manifest["programs"])
    print(json.dumps({
        "bundle": args.out,
        "programs": len(manifest["programs"]),
        "bytes": total,
        "platforms": sorted({p for e in manifest["programs"]
                             for p in e["platforms"]}),
        "fingerprint": manifest["fingerprint"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
