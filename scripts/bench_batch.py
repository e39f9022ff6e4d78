"""Batched-throughput benchmark: N variable-length sentences, one dispatch.

The BASELINE.json config "padded/bucketed batch synthesis (N=32 variable-length
sentences, one jit dispatch)" — the capability the reference's bsz==1 asserts
preclude.  Reports aggregate xRT (total predicted audio seconds / wall).

Run: python scripts/bench_batch.py [--batch 32] [--iters 6]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the riverbank.",
    "Printing differs from most if not from all the arts and crafts "
    "represented in the exhibition.",
    "In the earliest times there was no printing press.",
    "He was charged with obtaining money under false pretences.",
    "Many of the old houses of the city have long since disappeared.",
    "The weather today is remarkably pleasant for this time of year.",
    "She carefully placed the ancient manuscript back on the wooden shelf.",
    "A committee was appointed to investigate the condition of the prison.",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig()
    params = random_params(config, keep_training=False)
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablcfgijnopqrtx.")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    model = Synthesizer(
        config, tok, params,
        EngineConfig(token_buckets=(256,), frames_per_token=2.0),
    )
    rate = config.sampling_rate
    texts = [SENTENCES[i % len(SENTENCES)] for i in range(args.batch)]

    warm = model.synthesize_raw(texts, seed=0, max_redispatch=0)
    np.asarray(warm.waveform)

    audio_sec, wall = 0.0, 0.0
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = model.synthesize_raw(texts, seed=i, max_redispatch=0)
        np.asarray(out.waveform)
        wall += time.perf_counter() - t0
        audio_sec += float(np.sum(np.asarray(out.lengths))) / rate

    xrt = audio_sec / wall
    per_dispatch_ms = wall / args.iters * 1000
    print(f"batch={args.batch}: {xrt:.1f}x real-time aggregate "
          f"({per_dispatch_ms:.1f} ms/dispatch, "
          f"{audio_sec / args.iters:.1f} s audio/dispatch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
