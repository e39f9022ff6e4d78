"""Precision/quantization decision table: fp32 vs bf16 vs int8 weights vs both.

Measures, per variant, on the real chip:
  * pipelined single-stream xRT (the headline methodology, batch 1)
  * batch-8 and batch-32 throughput (audio seconds per wall second)
  * mel-L1 vs the fp32 output on the same seeds (production quality delta)

This is SURVEY §7 hard-part 6 ("precision policy") made empirical — the
reference's policy is fp16 conv weights on disk, fp32 compute
(/root/reference/scripts/export_vits.py:87); ours is chosen from this table
(see BASELINE.md "Precision policy").  Writes bench detail under the
"precision_table" key.

Usage: python scripts/bench_precision.py [--iters 16] [--update-detail]
"""

import argparse
import json
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import numpy as np

SENTENCES_IDX = [0, 1, 2, 3, 4, 5, 6, 7]


def build_model(variant: str):
    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.quantize import quantize_params
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig()
    params = random_params(config, seed=0, keep_training=False)
    if "int8" in variant:
        params = quantize_params(params)
    dtype = "bfloat16" if "bf16" in variant else "float32"
    engine = EngineConfig(
        token_buckets=(512,), frames_per_token=2.0, compute_dtype=dtype
    )
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablcfgijnopqrtx0123456789_-")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    return Synthesizer(config, tok, params, engine)


def pipelined_xrt(model, sentences, iters, depth=4):
    audio0 = model.stats["audio_seconds"]
    q = deque()
    t0 = time.perf_counter()
    for i in range(iters):
        q.append(model.submit(sentences[i % len(sentences)], seed=i))
        if len(q) >= depth:
            model.collect(q.popleft(), max_redispatch=0)
    while q:
        model.collect(q.popleft(), max_redispatch=0)
    wall = time.perf_counter() - t0
    return (model.stats["audio_seconds"] - audio0) / wall


def batch_xrt(model, sentences, batch, iters=6):
    texts = [sentences[i % len(sentences)] for i in range(batch)]
    seeds = list(range(batch))
    model.synthesize_raw(texts, seed=seeds, max_redispatch=0)  # warm
    audio0 = model.stats["audio_seconds"]
    q = deque()
    t0 = time.perf_counter()
    for it in range(iters):
        q.append(model.submit(texts, seed=[it * batch + s for s in seeds]))
        if len(q) >= 2:
            model.collect(q.popleft(), max_redispatch=0)
    while q:
        model.collect(q.popleft(), max_redispatch=0)
    wall = time.perf_counter() - t0
    return (model.stats["audio_seconds"] - audio0) / wall


def quality_vs(ref_waves, model, sentences):
    from vits_tpu.utils.mel import mel_l1

    sr = model.config.sampling_rate
    diffs = []
    for i, text in enumerate(sentences[:4]):
        out = model.synthesize_raw(text, seed=i, max_redispatch=0)
        w = out.waveform[0][: int(out.lengths[0])].astype(np.float32)
        r = ref_waves[i]
        n = min(len(w), len(r))
        diffs.append(float(mel_l1(w[None, :n], r[None, :n], sample_rate=sr)))
    return float(np.mean(diffs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    from bench import SENTENCES

    table = {}
    ref_waves = None
    for variant in ("fp32", "bf16", "int8_fp32", "int8_bf16"):
        model = build_model(variant)
        model.synthesize_raw(SENTENCES[0], seed=0, max_redispatch=0)  # warm batch-1
        row = {
            "xrt_b1_pipelined": round(
                pipelined_xrt(model, SENTENCES, args.iters), 1),
            "xrt_b8": round(batch_xrt(model, SENTENCES, 8), 1),
            "xrt_b32": round(batch_xrt(model, SENTENCES, 32), 1),
        }
        if variant == "fp32":
            ref_waves = []
            for i, text in enumerate(SENTENCES[:4]):
                out = model.synthesize_raw(text, seed=i, max_redispatch=0)
                ref_waves.append(
                    out.waveform[0][: int(out.lengths[0])].astype(np.float32))
            row["mel_l1_vs_fp32"] = 0.0
        else:
            row["mel_l1_vs_fp32"] = round(quality_vs(ref_waves, model, SENTENCES), 5)
        table[variant] = row
        print(variant, json.dumps(row), flush=True)

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["precision_table"] = {
            "note": ("batch-1 pipelined (depth 4) + batch-8/32 double-buffered "
                     "throughput on TPU v5e via tunnel; mel-L1 on 4 bench "
                     "sentences vs the fp32 engine at identical seeds; random "
                     "MMS-shaped weights"),
            **table,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")


if __name__ == "__main__":
    main()
