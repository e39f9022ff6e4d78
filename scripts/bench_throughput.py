"""Throughput benches beyond the headline: pipelined single-stream + batched.

The headline bench (bench.py) is strictly sequential per utterance — each
dispatch pays the full host<->device round trip (~25 ms through the remote
tunnel; dominant now that the compiled program is ~11 ms).  Real serving keeps
submissions in flight (Synthesizer.submit/collect), so this measures:
  * pipelined single-utterance stream (depth 2/4)
  * batch-8 / batch-32 single-dispatch throughput
and records them in BENCH_DETAIL.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from collections import deque

import numpy as np

from bench import SENTENCES


def main() -> int:
    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig()
    params = random_params(config, seed=0, keep_training=False)
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablcfgijnopqrtx0123456789_-")}
    tokenizer = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    model = Synthesizer(
        config, tokenizer, params,
        EngineConfig(token_buckets=(512,), frames_per_token=2.0),
    )
    rate = model.config.sampling_rate
    results = {}

    # warm-up single shape
    model.collect(model.submit(SENTENCES[0], seed=0), max_redispatch=0)

    n = int(os.environ.get("VITS_BENCH_ITERS", "16"))

    # --- sequential baseline (same as bench.py) ---------------------------- #
    a0 = model.stats["audio_seconds"]
    t0 = time.perf_counter()
    for i in range(n):
        model.collect(model.submit(SENTENCES[i % len(SENTENCES)], seed=i),
                      max_redispatch=0)
    wall = time.perf_counter() - t0
    results["sequential_xrt"] = round((model.stats["audio_seconds"] - a0) / wall, 1)

    # --- pipelined single stream ------------------------------------------- #
    for depth in (2, 4):
        a0 = model.stats["audio_seconds"]
        pending = deque()
        t0 = time.perf_counter()
        for i in range(n):
            pending.append(model.submit(SENTENCES[i % len(SENTENCES)], seed=i))
            if len(pending) >= depth:
                model.collect(pending.popleft(), max_redispatch=0)
        while pending:
            model.collect(pending.popleft(), max_redispatch=0)
        wall = time.perf_counter() - t0
        results[f"pipelined_depth{depth}_xrt"] = round(
            (model.stats["audio_seconds"] - a0) / wall, 1)

    # --- batched dispatch ---------------------------------------------------#
    for bs in (8, 32):
        texts = [SENTENCES[i % len(SENTENCES)] for i in range(bs)]
        model.collect(model.submit(texts, seed=list(range(bs))), max_redispatch=0)
        a0 = model.stats["audio_seconds"]
        iters = max(4, n // 4)
        t0 = time.perf_counter()
        for i in range(iters):
            model.collect(model.submit(texts, seed=list(range(i, i + bs))),
                          max_redispatch=0)
        wall = time.perf_counter() - t0
        results[f"batch{bs}_xrt"] = round((model.stats["audio_seconds"] - a0) / wall, 1)

    print(json.dumps(results))
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    detail = json.load(open(path)) if os.path.exists(path) else {}
    detail["throughput"] = results
    json.dump(detail, open(path, "w"), indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
