"""Export HF VITS checkpoints to the reference-compatible .ggml format.

Rebuild of the reference export pipeline (/root/reference/scripts/export_vits.py):
pulls HF ``VitsModel``/``VitsTokenizer``, merges weight-norm parametrizations,
stores conv weights fp16, and serializes tokenizer + config + tensors — via
this repo's own loader/writer, so the output loads in BOTH engines.

    python scripts/export_vits.py [model_name_or_dir ...] [--out-dir scripts]
    # default: facebook/mms-tts-eng + facebook/mms-tts-spa (needs network/cache)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MODELS = {
    "facebook/mms-tts-eng": "vits-english.ggml",
    "facebook/mms-tts-spa": "vits-spanish.ggml",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="*", default=None,
                    help="HF names or local dirs (default: MMS eng+spa)")
    ap.add_argument("--out-dir", default="scripts")
    ap.add_argument("--fp32", action="store_true", help="keep convs fp32")
    ap.add_argument("--int8", action="store_true",
                    help="quantize weights (io/quantize.py) and write an int8 "
                         "checkpoint (~4x smaller; this engine only — the "
                         "reference parser rejects dtype code 2)")
    args = ap.parse_args(argv)

    from vits_tpu.io.loader import export_to_ggml, load_hf_pretrained

    models = args.models or list(DEFAULT_MODELS)
    for name in models:
        out_name = DEFAULT_MODELS.get(name) or (
            os.path.basename(name.rstrip("/")).replace("/", "-") + ".ggml"
        )
        if args.int8:
            out_name = out_name.replace(".ggml", "-int8.ggml")
        dest = os.path.join(args.out_dir, out_name)
        print(f"Exporting {name} -> {dest}")
        config, tokenizer, params = load_hf_pretrained(name)
        if args.int8:
            from vits_tpu.io.quantize import quantize_params

            params = quantize_params(params)
        export_to_ggml(dest, config, tokenizer, params,
                       fp16_convs=not args.fp32 and not args.int8)
        print(f"Done! {os.path.getsize(dest):,} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
