"""Time-to-first-audio (TTFA) benchmark: streaming vs one-shot synthesis.

BASELINE.md tracks p50 TTFA.  Measures, on the current backend:
  * one-shot: full synthesize() latency (TTFA == total latency, the
    reference's behavior)
  * streaming: time until the FIRST PCM chunk is available

Run: python scripts/bench_ttfa.py [--iters 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunk-frames", type=int, default=64)
    args = ap.parse_args()

    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.streaming import StreamingDecoder
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig()
    params = random_params(config, keep_training=False)
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablcfgijnopqrtx")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    # frames_per_token 2.5: random MMS-shaped weights predict ~2.2 frames per
    # token, so 2.0 capacity overflows at paragraph scale and every call pays
    # the doubling ladder (prior recomputed at 2x frames) — that measures the
    # overflow path, not streaming.  2.5 is the no-overflow operating point.
    model = Synthesizer(
        config, tok, params,
        EngineConfig(token_buckets=(1024, 2048), frames_per_token=2.5),
    )
    stream = StreamingDecoder(model, chunk_frames=args.chunk_frames, margin_frames=20)
    # Streaming targets long utterances (paragraph-scale): the one-shot decode
    # grows with length while TTFA stays one latents pass + one chunk.
    text = ("the quick brown fox jumps over the lazy dog near the riverbank "
            "while morning light settles over the quiet valley and the river "
            "hums its old song to anyone patient enough to listen ") * 3

    # warm both paths
    model.synthesize_raw(text, max_redispatch=0)
    next(stream.stream(text))

    oneshot, first_chunk = [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = model.synthesize_raw(text, seed=i, max_redispatch=0)
        np.asarray(out.waveform)
        oneshot.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        chunk = next(stream.stream(text, seed=i))
        first_chunk.append(time.perf_counter() - t0)
        del chunk

    p50 = lambda xs: sorted(xs)[len(xs) // 2] * 1000
    print(f"p50 one-shot latency : {p50(oneshot):8.2f} ms")
    print(f"p50 TTFA (streaming) : {p50(first_chunk):8.2f} ms "
          f"({p50(oneshot) / p50(first_chunk):.2f}x lower)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
