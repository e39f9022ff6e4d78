"""Multiplexed streaming: concurrent /stream clients share window dispatches.

``StreamingDecoder`` (engine/streaming.py) decodes fixed-size latent windows —
but each client's windows dispatch alone, so N concurrent streams queue N
serialized single-row programs on the device.  On a chip that synthesizes
hundreds of times faster than real time, a batch-1 window decode leaves the
MXU mostly idle; concurrent streams are nearly free if their windows ride one
batched dispatch.  That is what ``MultiplexedStreamingDecoder`` does: the
continuous-batching pattern applied to TTS streaming.

Every stream's window decode has the SAME shape by construction (the decoder's
chunk/margin geometry is fixed per instance; whole-utterance decodes for short
inputs are mask-padded up to the window), so a background worker can collect
pending window requests from any number of streams — each at its own position
in its own utterance — pad to a power-of-two batch bucket, and run ONE
program.  Emitted PCM is sample-identical to the solo decoder: rows of a
batched conv stack are independent, and pad rows are masked exactly like the
batch engine's (tests/test_mux.py pins both).

The reference has no serving path at all (SURVEY.md: single-process CPU
library, batch==1 asserted, /root/reference/src/vits.cpp:303); this is
TPU-economics-native design, not a port.

Usage (drop-in for StreamingDecoder, including in engine/server.py)::

    mux = MultiplexedStreamingDecoder(model, max_batch=8)
    for pcm in mux.stream("hello"):   # same interface; windows now batch
        play(pcm)
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from vits_tpu.engine.streaming import StreamingDecoder


@dataclass
class _WindowReq:
    """One pending window decode: device-array slices + a completion event."""

    latents: object  # (1, W, C) device slice
    mask3: object  # (1, W, 1)
    spk: Optional[object]  # (1, 1, emb) or None
    window: int
    done: threading.Event = field(default_factory=threading.Event)
    wave: Optional[object] = None  # (1, W * upsample) device row when done
    error: Optional[str] = None


class MultiplexedStreamingDecoder(StreamingDecoder):
    """StreamingDecoder whose window decodes batch across concurrent streams.

    ``max_batch`` bounds rows per dispatch (ragged counts pad up to a
    power-of-two bucket, so at most log2(max_batch)+1 batched programs
    compile per window shape); ``batch_window_ms`` is how long the worker
    waits to fill a batch once one request is pending — with pipelined
    streams (pipeline_depth >= 2) follow-up windows are already queued and
    the wait never triggers in steady state.
    """

    def __init__(
        self,
        synthesizer,
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
        resolve_timeout_s: float = 300.0,
        **kwargs,
    ):
        super().__init__(synthesizer, **kwargs)
        self.max_batch = max(1, max_batch)
        self.batch_window_s = batch_window_ms / 1000.0
        self.resolve_timeout_s = resolve_timeout_s
        self._queue: "queue.Queue[_WindowReq]" = queue.Queue(maxsize=1024)
        self.stats = {"windows": 0, "dispatches": 0, "max_rows": 0}
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # --- the dispatch seam: enqueue instead of running ------------------- #
    @property
    def _window(self) -> int:
        return self.chunk_frames + 2 * self.total_margin

    def _dispatch_window(self, prior_latents, frame_mask3, speaker_embeddings,
                         lo: int, window: int):
        req = _WindowReq(
            latents=prior_latents[:, lo : lo + window],
            mask3=frame_mask3[:, lo : lo + window],
            spk=speaker_embeddings,
            window=window,
        )
        self._queue.put(req)
        return req

    def _dispatch_full(self, prior_latents, frame_mask3, speaker_embeddings,
                       num_frames: int):
        # Mask-pad short utterances up to the shared window so every request
        # in the system has one shape (padded frames are zero-masked — the
        # same contract the bucketed batch engine pins vs HF).
        window = self._window
        pad = window - num_frames
        if pad > 0:
            prior_latents = jnp.pad(prior_latents, ((0, 0), (0, pad), (0, 0)))
            frame_mask3 = jnp.pad(frame_mask3, ((0, 0), (0, pad), (0, 0)))
        return self._dispatch_window(
            prior_latents, frame_mask3, speaker_embeddings, 0, window
        )

    def _resolve(self, handle) -> np.ndarray:
        if not handle.done.wait(timeout=self.resolve_timeout_s):
            raise TimeoutError("multiplexed window decode timed out")
        if handle.error is not None:
            raise RuntimeError(f"window decode failed: {handle.error}")
        return np.asarray(handle.wave)

    # --- worker ----------------------------------------------------------- #
    def stop(self) -> None:
        self._stop.set()

    def _collect(self) -> list[_WindowReq]:
        import time

        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.batch_window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            # Speaker conditioning is a different program when absent
            # (None -> no cond_layer adds), so rows can only share a dispatch
            # with matching presence; a mixed pickup splits into two.
            with_spk = [r for r in batch if r.spk is not None]
            without = [r for r in batch if r.spk is None]
            for group in (with_spk, without):
                if not group:
                    continue
                try:
                    self._run_batch(group)
                except Exception as exc:  # surface to every waiter
                    for req in group:
                        req.error = f"{type(exc).__name__}: {exc}"
                        req.done.set()

    @staticmethod
    def _bucket(n: int, max_batch: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, max_batch)

    def _run_batch(self, reqs: list[_WindowReq]) -> None:
        window = reqs[0].window
        assert all(r.window == window for r in reqs), "mixed window shapes"
        b = self._bucket(len(reqs), self.max_batch)
        rows_lat = [r.latents for r in reqs]
        rows_mask = [r.mask3 for r in reqs]
        # pad rows replicate row 0 (cheapest same-shape filler; outputs of a
        # batched row-independent conv stack don't cross rows, and the pad
        # rows are never read back)
        for _ in range(b - len(reqs)):
            rows_lat.append(reqs[0].latents)
            rows_mask.append(reqs[0].mask3)
        latents = jnp.concatenate(rows_lat, axis=0)
        mask3 = jnp.concatenate(rows_mask, axis=0)
        spk = None
        if reqs[0].spk is not None:
            rows_spk = [r.spk for r in reqs]
            rows_spk.extend(reqs[0].spk for _ in range(b - len(reqs)))
            spk = jnp.concatenate(rows_spk, axis=0)
        wave = self._decode_fn(window)(self._params, latents, mask3, spk)
        self._prefetch(wave)
        for i, req in enumerate(reqs):
            req.wave = wave[i : i + 1]
            req.done.set()
        with self._stats_lock:
            self.stats["windows"] += len(reqs)
            self.stats["dispatches"] += 1
            self.stats["max_rows"] = max(self.stats["max_rows"], len(reqs))

    # --- warmup ------------------------------------------------------------ #
    def warmup(self, token_buckets=None, overflow_ladder: int = 0) -> None:
        """Compile prior programs (via the base warmup, including its
        capacity-overflow ladder rungs) plus the batched window decode at
        every batch bucket — first clients must not pay 20-40 s compiles
        while holding stream slots."""
        super().warmup(token_buckets=token_buckets,
                       overflow_ladder=overflow_ladder)
        synth = self.synth
        window = self._window
        config = synth.config
        buckets = []
        b = 1
        while b <= self.max_batch:
            buckets.append(b)
            b *= 2
        spk_variants = [None]
        if getattr(config, "num_speakers", 1) > 1:
            emb = jnp.take(
                jnp.asarray(self._params["embed_speaker.weight"]),
                jnp.zeros((1,), jnp.int32), axis=0,
            )[:, None, :]
            spk_variants.append(emb)
        # Match live traffic's dtypes (bf16 engines produce bf16 latents).
        dt = getattr(synth, "compute_dtype", jnp.float32)
        wave = None
        for nb in buckets:
            lat = jnp.zeros((nb, window, config.flow_size), dt)
            mask3 = jnp.ones((nb, window, 1), dt)
            for spk1 in spk_variants:
                spk = None if spk1 is None else jnp.concatenate([spk1] * nb, axis=0)
                wave = self._decode_fn(window)(self._params, lat, mask3, spk)
        if wave is not None:
            np.asarray(wave)
