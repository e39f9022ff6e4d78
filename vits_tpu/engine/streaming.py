"""Chunked streaming decode: low time-to-first-audio (TTFA).

The reference synthesizes the entire utterance in one graph and returns only at
the end (vits.cpp:1101-1191) — TTFA == total latency.  Here only the globally-
coupled stages (encoder -> durations -> alignment -> prior sample) run over the
full utterance, in one small program; the FLOW and the HiFiGAN vocoder — both
frame-local conv stacks — then decode fixed-size latent windows fused into one
program per chunk, with a receptive-field margin on each side.  The margin
region is recomputed per chunk and discarded, so emitted PCM is bit-identical
to the one-shot decode (overlap-*discard*: given enough context the interior
of a feed-forward conv stack is exact — verified in tests/test_streaming.py).

Round-1 ran the full flow before the first chunk, which made the latents
program the TTFA floor; chunking the flow (half receptive field: 4 couplings x
4 wavenet layers x k=5 dilation-1 = 32 frames) removes that floor.

Margins: ``margin_frames`` covers the vocoder's receptive field (~16 latent
frames for the MMS config; 20 is the safe default) and ``flow_margin_frames``
the flow's (32 exactly; 40 default) — the decode window recomputes
chunk + 2*(margin + flow_margin) frames.

Note on comparing against ``Synthesizer.synthesize``: streamed chunks are
full-precision floats, while the engine ships its waveform as int16 PCM by
default (``EngineConfig.transfer_int16``) — exact equality holds with
``transfer_int16=False``; otherwise the difference is the <= 1/32767 transfer
quantization.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.io.params import ParamView
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.vits import latents_from_prior, text_to_prior


class StreamingDecoder:
    """Wraps a Synthesizer with chunked flow+vocoder dispatch.

    Usage::

        stream = StreamingDecoder(model)
        for pcm_chunk in stream.stream("hello world"):
            play(pcm_chunk)  # float32 PCM
    """

    def __init__(
        self,
        synthesizer,
        chunk_frames: int = 64,
        margin_frames: int = 20,
        flow_margin_frames: int = 40,
        pipeline_depth: int = 2,
    ):
        self.synth = synthesizer
        # Under a dp serving mesh the synthesizer's params are
        # NamedSharding-replicated; a plain jax.jit over them would run
        # every chunk replicated on EVERY chip (N-1 chips of duplicate work
        # contending with the sharded batch dispatches).  Pin a
        # single-device copy for the streaming programs instead —
        # replicated -> one-device is a local copy, no cross-chip traffic.
        self._params = synthesizer.params
        if getattr(synthesizer, "mesh", None) is not None:
            dev = synthesizer.mesh.devices.flat[0]
            self._params = jax.device_put(synthesizer.params, dev)
        self.chunk_frames = chunk_frames
        self.margin_frames = margin_frames
        self.flow_margin_frames = flow_margin_frames
        # Window decodes in flight at once: depth 2+ overlaps each chunk's
        # device->host transfer (and host round-trip) with the next chunk's
        # compute, exactly like Synthesizer.submit/collect.
        self.pipeline_depth = max(1, pipeline_depth)
        self._prior_fn_cache = {}
        self._decode_fn_cache = {}

    @property
    def total_margin(self) -> int:
        return self.margin_frames + self.flow_margin_frames

    # ------------------------------------------------------------------ #
    def _prior_fn(self, num_frames: int):
        if num_frames not in self._prior_fn_cache:
            config = self.synth.config

            engine = self.synth.engine
            use_pallas_attention = engine.use_pallas_attention
            if use_pallas_attention is None:
                use_pallas_attention = jax.default_backend() == "tpu"

            from vits_tpu.engine.synthesizer import _matmul_precision_ctx

            @jax.jit
            def run(params, ids, mask, rng, speaker_id, controls):
                noise_scale, noise_scale_duration, speaking_rate = controls
                with _matmul_precision_ctx(engine.matmul_precision):
                    return text_to_prior(
                        params, config, ids, mask, num_frames,
                        rng=rng, speaker_id=speaker_id,
                        noise_scale=noise_scale,
                        noise_scale_duration=noise_scale_duration,
                        speaking_rate=speaking_rate,
                        use_pallas_attention=use_pallas_attention,
                        pallas_precision=engine.pallas_precision,
                    )

            self._prior_fn_cache[num_frames] = run
        return self._prior_fn_cache[num_frames]

    def _use_pallas(self) -> bool:
        # Match Synthesizer._compiled so streamed chunks run the SAME vocoder
        # path as one-shot synthesis (sample-exactness holds per backend).
        flag = self.synth.engine.use_pallas_vocoder
        return jax.default_backend() == "tpu" if flag is None else flag

    def _decode_fn(self, window: int):
        """Fused flow + vocoder over one latent window — ONE dispatch/chunk."""
        if window not in self._decode_fn_cache:
            config = self.synth.config
            use_pallas = self._use_pallas()

            from vits_tpu.engine.synthesizer import _matmul_precision_ctx

            @jax.jit
            def run(params, prior_piece, mask3, speaker_embeddings):
                with _matmul_precision_ctx(self.synth.engine.matmul_precision):
                    latents = latents_from_prior(
                        params, config, prior_piece, mask3, speaker_embeddings,
                        use_pallas=self.synth.engine.use_pallas_flow,
                        pallas_precision=self.synth.engine.pallas_precision,
                    )
                    return hifigan(
                        ParamView(params), config, latents, mask3,
                        speaker_embeddings, use_pallas=use_pallas,
                        pallas_precision=self.synth.engine.pallas_precision,
                        pallas_value_dtype=self.synth._pallas_value_dtype,
                    )

            self._decode_fn_cache[window] = run
        return self._decode_fn_cache[window]

    def warmup(self, token_buckets=None, overflow_ladder: int = 0) -> None:
        """Compile the streaming programs ahead of traffic.

        One prior program per token bucket plus the shared window decode —
        without this the first /stream client pays every cold compile
        (20-40 s each on TPU) while occupying a serving stream slot.

        ``overflow_ladder=N`` additionally compiles the first N rungs of the
        prior's own capacity-doubling ladder (``synthesize``'s escalation on
        a predicted length past the bucket capacity) — without it the FIRST
        overflowing stream pays a synchronous prior compile mid-request
        (observed as a multi-second p99 in the round-5 serving measurement).
        """
        synth = self.synth
        buckets = tuple(token_buckets or synth.engine.token_buckets)
        window = self.chunk_frames + 2 * self.total_margin
        controls = synth._controls(None, None, None)
        rng = jax.random.PRNGKey(0)
        speakers = [None]
        if getattr(synth.config, "num_speakers", 1) > 1:
            speakers.append(np.asarray([0], np.int32))  # (1,) spk signature
        wave = None
        for tb in buckets:
            ids = np.zeros((1, tb), np.int32)
            mask = np.ones((1, tb), np.float32)
            base_frames = synth.engine.frame_bucket(tb)
            for spk in speakers:
                for rung in range(overflow_ladder + 1):
                    num_frames = base_frames * (2 ** rung)
                    prior = self._prior_fn(num_frames)(
                        self._params, jnp.asarray(ids), jnp.asarray(mask), rng,
                        spk, controls,
                    )
                    w = min(window, num_frames)
                    wave = self._decode_fn(w)(
                        self._params, prior.prior_latents[:, :w],
                        prior.frame_mask[..., None][:, :w],
                        prior.speaker_embeddings,
                    )
        if wave is not None:
            np.asarray(wave)  # block until the last compile lands

    # --- window-dispatch seam (overridden by MultiplexedStreamingDecoder) -- #
    @staticmethod
    def _prefetch(arr) -> None:
        try:
            arr.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass

    def _dispatch_window(self, prior_latents, frame_mask3, speaker_embeddings,
                         lo: int, window: int):
        """Dispatch one fixed-size window decode; returns an opaque handle."""
        wave = self._decode_fn(window)(
            self._params,
            prior_latents[:, lo : lo + window],
            frame_mask3[:, lo : lo + window],
            speaker_embeddings,
        )
        self._prefetch(wave)
        return wave

    def _dispatch_full(self, prior_latents, frame_mask3, speaker_embeddings,
                       num_frames: int):
        """Whole-utterance decode for inputs that fit in one window."""
        wave = self._decode_fn(num_frames)(
            self._params, prior_latents, frame_mask3, speaker_embeddings
        )
        self._prefetch(wave)
        return wave

    def _resolve(self, handle) -> np.ndarray:
        """Handle -> (1, T) float PCM; blocks until the decode lands."""
        return np.asarray(handle)

    # ------------------------------------------------------------------ #
    def stream(
        self, text: str, seed: int = 0, speaker_id: int | None = None,
        noise_scale: float | None = None,
        noise_scale_duration: float | None = None,
        speaking_rate: float | None = None,
    ) -> Iterator[np.ndarray]:
        """Yield float32 PCM chunks; concatenation == one-shot synthesis."""
        synth = self.synth
        tok = synth.tokenizer
        from vits_tpu.engine.synthesizer import _next_bucket

        encoded = tok.encode(text)
        t_bucket = _next_bucket(synth.engine.token_buckets, max(len(encoded), 1))
        ids, mask = tok.pad([encoded], pad_to=t_bucket)
        num_frames = synth.engine.frame_bucket(t_bucket)
        spk = None if speaker_id is None else np.asarray([speaker_id], np.int32)

        rng = jax.random.PRNGKey(seed)
        controls = synth._controls(noise_scale, noise_scale_duration, speaking_rate)
        up = synth.config.total_upsample
        chunk, margin = self.chunk_frames, self.total_margin
        window = chunk + 2 * margin

        prior = self._prior_fn(num_frames)(
            self._params, jnp.asarray(ids), jnp.asarray(mask), rng, spk, controls
        )
        self._prefetch(prior.total_duration)

        # Speculative first-window decode: the common case is no capacity
        # overflow, so dispatch chunk 0 BEFORE blocking on total_duration —
        # the overflow check's host round-trip then rides behind the first
        # window's compute instead of preceding it (TTFA - one tunnel RTT).
        spec_wave = None
        if num_frames > window:
            spec_wave = self._dispatch_window(
                prior.prior_latents, prior.frame_mask[..., None],
                prior.speaker_embeddings, 0, window,
            )

        # Escalate capacity (doubling ladder, like Synthesizer.synthesize_raw)
        # if the predicted length overflowed the frame bucket.
        for _ in range(4):
            predicted = int(np.asarray(prior.total_duration)[0])
            if predicted <= num_frames:
                break
            spec_wave = None  # latents are being recomputed; discard
            while num_frames < predicted:
                num_frames *= 2
            prior = self._prior_fn(num_frames)(
                self._params, jnp.asarray(ids), jnp.asarray(mask), rng, spk, controls
            )
        valid_frames = int(np.minimum(np.asarray(prior.total_duration)[0], num_frames))
        prior_latents = prior.prior_latents
        frame_mask3 = prior.frame_mask[..., None]

        if num_frames <= window:
            # Utterance fits in one window: plain one-shot decode.
            handle = self._dispatch_full(
                prior_latents, frame_mask3, prior.speaker_embeddings, num_frames
            )
            yield self._resolve(handle)[0, : valid_frames * up]
            return

        def submit(start):
            lo = min(max(start - margin, 0), num_frames - window)
            if start == 0 and spec_wave is not None:
                handle = spec_wave  # lo == 0 for the first chunk
            else:
                handle = self._dispatch_window(
                    prior_latents, frame_mask3, prior.speaker_embeddings,
                    lo, window,
                )
            offset = (start - lo) * up
            n_valid = min(chunk, valid_frames - start) * up
            return handle, offset, n_valid

        from collections import deque

        starts = list(range(0, valid_frames, chunk))
        inflight: deque = deque()
        for start in starts:
            inflight.append(submit(start))
            if len(inflight) >= self.pipeline_depth:
                handle, offset, n_valid = inflight.popleft()
                yield self._resolve(handle)[0, offset : offset + n_valid]
        while inflight:
            handle, offset, n_valid = inflight.popleft()
            yield self._resolve(handle)[0, offset : offset + n_valid]

    def synthesize_streaming(
        self, text: str, seed: int = 0, speaker_id: int | None = None, **controls
    ) -> np.ndarray:
        """Convenience: concatenate all streamed chunks."""
        return np.concatenate(
            list(self.stream(text, seed=seed, speaker_id=speaker_id, **controls))
        )
