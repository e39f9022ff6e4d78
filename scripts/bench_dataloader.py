"""Training data-loader throughput: numpy pipeline vs native (C++) loader.

Builds a synthetic LJSpeech-layout corpus of MMS-shaped utterances
(16 kHz, n_fft=1024, hop=256 — the real training framing), then measures
utterances/s and batch latency for:

  * numpy          read_wav + linear_spectrogram, single thread
  * native         vt_utt_load, single thread
  * native xN      vt_utt_load from N threads (the C call releases the GIL)

Usage: python scripts/bench_dataloader.py [--utts 96] [--seconds 4.0] [--workers 8]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vits_tpu.config import VitsConfig
from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.train.data import VitsDataset
from vits_tpu.utils.wav import write_wav


def build_corpus(root: str, n_utts: int, seconds: float, rate: int) -> None:
    os.makedirs(os.path.join(root, "wavs"))
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_utts):
        n = int(rate * seconds * (0.5 + rng.random()))
        audio = np.clip(rng.standard_normal(n) * 0.2, -1, 1).astype(np.float32)
        write_wav(os.path.join(root, "wavs", f"u{i}.wav"), audio, rate)
        lines.append(f"u{i}|raw|synthetic utterance number {i}")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))


def run(dataset: VitsDataset, batch_size: int) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = 0
    for batch in dataset.batches(batch_size, np.random.default_rng(1), epochs=1):
        n += batch.input_ids.shape[0]
    return time.perf_counter() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=96)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    config = VitsConfig()  # MMS defaults: bins=513 -> n_fft=1024, hop=256
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz0123456789")}
    tok = VitsTokenizer(vocab=vocab, pad_token=" ", unk_token="a")

    with tempfile.TemporaryDirectory() as root:
        build_corpus(root, args.utts, args.seconds, config.sampling_rate)
        max_frames = int(config.sampling_rate * args.seconds * 1.5 / config.total_upsample)

        results = {}
        variants = [("numpy", False, 0), ("native", True, 0),
                    (f"native x{args.workers}", True, args.workers)]
        from vits_tpu.io import native
        if not native.loader_available():
            print("native loader not built; numpy only", file=sys.stderr)
            variants = variants[:1]
        for name, use_native, workers in variants:
            ds = VitsDataset(root, tok, config, max_frames=max_frames,
                             use_native=use_native, num_workers=workers)
            run(ds, args.batch_size)  # warm page cache so IO is equal-footing
            dt, n = run(ds, args.batch_size)
            results[name] = {"utts_per_s": round(n / dt, 1), "wall_s": round(dt, 3)}
            print(f"{name:>12}: {n / dt:8.1f} utts/s  ({dt:.3f} s for {n})")

        if "numpy" in results and len(results) > 1:
            base = results["numpy"]["utts_per_s"]
            for name, r in results.items():
                r["speedup"] = round(r["utts_per_s"] / base, 2)
        print(json.dumps({"dataloader": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
