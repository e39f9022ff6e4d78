"""Time-to-first-audio (TTFA) benchmark: streaming vs one-shot synthesis.

BASELINE.md tracks p50 TTFA.  Measures, on the current backend:
  * one-shot: full synthesize() latency (TTFA == total latency, the
    reference's behavior)
  * streaming: time until the FIRST PCM chunk is available
  * --http: the same TTFA over the server's chunked /stream endpoint
    (localhost loopback; what a network client actually observes)

Run: python scripts/bench_ttfa.py [--iters 10] [--http]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _http_ttfa(model, streamer, text, seed) -> float:
    """One /stream request; seconds until the first PCM bytes arrive."""
    import http.client
    import json
    import threading

    from vits_tpu.engine.server import serve

    server, worker = serve(model, port=0, streamer=streamer)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection(
            f"127.0.0.1:{server.server_address[1]}", timeout=600)
        t0 = time.perf_counter()
        conn.request("POST", "/stream",
                     body=json.dumps({"text": text, "seed": seed}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        got = b""
        while len(got) <= 44:  # past the WAV header = first audio bytes
            piece = resp.read(4096)
            if not piece:
                break
            got += piece
        ttfa = time.perf_counter() - t0
        while resp.read(65536):
            pass
        conn.close()
        return ttfa
    finally:
        worker.stop()
        server.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunk-frames", type=int, default=64)
    ap.add_argument("--http", action="store_true",
                    help="also measure TTFA over the chunked /stream endpoint")
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
    # frames_per_token rides the 2.5 default (the measured no-overflow MMS
    # operating point — round-1's TTFA bug was measuring the overflow ladder).
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(1024, 2048)))
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

    if args.http:
        http_ttfa = [
            _http_ttfa(model, stream, text, seed=100 + i)
            for i in range(max(3, args.iters // 2))
        ]
        print(f"p50 TTFA (HTTP /stream, loopback): {p50(http_ttfa):8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
