"""The synthesis engine: bucketed static shapes, jit cache, batched dispatch.

This is the runtime the reference's orchestrator (vits.cpp:1101-1191) becomes
on TPU.  The reference rebuilds and re-executes a pointer graph per utterance
with a host read in the middle; here each (token-bucket, frame-capacity) pair
compiles ONCE, utterances are padded into the bucket, whole batches go through
a single dispatch, and the only host decision is made *after* the fact: if the
predicted frame count overflowed the chosen capacity, the engine re-dispatches
at the next capacity (rare — capacity defaults to 2 frames/token and escalates
geometrically).

Public surface mirrors the reference C API (vits.h:87-102):
``Synthesizer.load`` ≈ vits_model_load_from_file/bytes,
``Synthesizer.synthesize`` ≈ vits_model_process.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from vits_tpu.config import EngineConfig, VitsConfig
from vits_tpu.models.vits import synthesize as synthesize_fn
from vits_tpu.text.tokenizer import VitsTokenizer


class EngineOutput(NamedTuple):
    """Host-side synthesis result (numpy arrays, fetched in one transfer)."""

    waveform: np.ndarray  # (B, capacity_samples) float32
    lengths: np.ndarray  # (B,) valid samples (clamped to capacity)
    frame_lengths: np.ndarray  # (B,) predicted frames, unclamped
    log_duration: np.ndarray  # (B, T_in, 1)


class PendingSynthesis(NamedTuple):
    """An in-flight dispatch (device futures — nothing host-blocking yet).

    JAX dispatch is asynchronous: ``Synthesizer.submit`` returns immediately
    and the device computes in the background; ``Synthesizer.collect`` blocks
    on the single device->host fetch.  Keeping 2+ submissions in flight hides
    dispatch latency entirely — the throughput serving pattern (the reference
    is strictly synchronous, one graph at a time)."""

    device_out: tuple
    ids: np.ndarray
    mask: np.ndarray
    num_frames: int
    rng: object
    speaker: Optional[np.ndarray]
    controls: tuple


def _next_bucket(buckets: Sequence[int], value: int) -> int:
    for b in buckets:
        if value <= b:
            return b
    # beyond the largest bucket: round up to a multiple of the largest
    biggest = buckets[-1]
    return ((value + biggest - 1) // biggest) * biggest


class Synthesizer:
    def __init__(
        self,
        config: VitsConfig,
        tokenizer: VitsTokenizer,
        params: dict,
        engine_config: Optional[EngineConfig] = None,
        device: Optional[jax.Device] = None,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.engine = engine_config or EngineConfig()
        self.device = device
        dtype = jnp.bfloat16 if self.engine.compute_dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dtype

        def _place(x):
            arr = jnp.asarray(x)
            if arr.dtype == jnp.float32 and dtype != jnp.float32:
                arr = arr.astype(dtype)
            return jax.device_put(arr, device) if device is not None else arr

        self.params = {k: _place(v) for k, v in params.items()}
        use_pallas = self.engine.use_pallas_vocoder
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas and dtype == jnp.float32:
            # Pack the fused-stage vocoder weights ONCE at load: in-trace
            # packing would re-run the shift-matrix scatters every dispatch
            # (models/hifigan.py::precompute_vocoder_packs).
            from vits_tpu.models.hifigan import precompute_vocoder_packs

            self.params.update(
                {k: _place(v) for k, v in
                 precompute_vocoder_packs(self.params, config).items()})
        # Observability counters (the reference's verbose/log machinery,
        # vits.cpp:1234-1239, reimagined as structured stats).
        # compiled_shapes counts DISTINCT dispatch signatures (batch, tokens,
        # frames, rng layout) — jax compiles one program per such signature,
        # not one per frame bucket.
        self._dispatch_shapes: set = set()
        self.stats = {
            "dispatches": 0,
            "redispatches": 0,
            "compiled_shapes": 0,
            "audio_seconds": 0.0,
            "wall_seconds": 0.0,
        }

    # ------------------------------------------------------------------ #
    @classmethod
    def load(
        cls,
        source,
        engine_config: Optional[EngineConfig] = None,
        device: Optional[jax.Device] = None,
    ) -> "Synthesizer":
        """Load from a .ggml path/bytes, an HF directory, or an HF hub name."""
        from vits_tpu.io import loader

        if isinstance(source, (bytes, bytearray)):
            config, tokenizer, params = loader.load_ggml(bytes(source))
        elif isinstance(source, str) and source.endswith(".ggml"):
            config, tokenizer, params = loader.load_ggml(source)
        else:
            config, tokenizer, params = loader.load_hf_pretrained(source)
        return cls(config, tokenizer, params, engine_config, device)

    # ------------------------------------------------------------------ #
    @functools.lru_cache(maxsize=None)  # noqa: B019 — engine owns its cache
    def _compiled(self, num_frames: int):
        config = self.config

        use_pallas = self.engine.use_pallas_vocoder
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        use_pallas_attention = self.engine.use_pallas_attention
        if use_pallas_attention is None:
            use_pallas_attention = jax.default_backend() == "tpu"
        transfer_int16 = self.engine.transfer_int16

        @functools.partial(jax.jit, static_argnames=("num_frames",))
        def run(params, input_ids, input_mask, rng, speaker_id, controls, num_frames):
            # controls = (noise_scale, noise_scale_duration, speaking_rate),
            # traced float32 scalars: per-call overrides never recompile
            # (the reference can only honor config values, vits.cpp:977-979).
            noise_scale, noise_scale_duration, speaking_rate = controls
            out = synthesize_fn(
                params, config, input_ids, input_mask, num_frames,
                rng=rng, speaker_id=speaker_id, use_pallas=use_pallas,
                pallas_precision=self.engine.pallas_precision,
                use_pallas_flow=self.engine.use_pallas_flow,
                use_pallas_attention=use_pallas_attention,
                noise_scale=noise_scale,
                noise_scale_duration=noise_scale_duration,
                speaking_rate=speaking_rate,
            )
            # Return only what the host needs: no latents (the streaming
            # decoder has its own latents program), and the waveform as int16
            # PCM when configured — device->host bytes are wall time.
            wave = out.waveform
            if transfer_int16:
                wave = jnp.round(
                    jnp.clip(wave.astype(jnp.float32), -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
            return (wave, out.lengths, out.frame_lengths, out.log_duration)

        return functools.partial(run, num_frames=num_frames)

    def _controls(self, noise_scale, noise_scale_duration, speaking_rate):
        """Per-call control overrides as traced float32 scalars."""
        cfg = self.config
        return (
            jnp.float32(cfg.noise_scale if noise_scale is None else noise_scale),
            jnp.float32(
                cfg.noise_scale_duration
                if noise_scale_duration is None
                else noise_scale_duration
            ),
            jnp.float32(cfg.speaking_rate if speaking_rate is None else speaking_rate),
        )

    def _dispatch(
        self, ids: np.ndarray, mask: np.ndarray, num_frames: int, rng, speaker_id,
        controls=None,
    ):
        import time

        t0 = time.perf_counter()
        fn = self._compiled(num_frames)
        if controls is None:
            controls = self._controls(None, None, None)
        out = fn(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask, dtype=self.compute_dtype),
            rng,
            speaker_id,
            controls,
        )
        self._dispatch_shapes.add(
            (ids.shape[0], ids.shape[1], num_frames, np.shape(rng), speaker_id is not None)
        )
        self.stats["compiled_shapes"] = len(self._dispatch_shapes)
        self.stats["dispatches"] += 1
        self.stats["wall_seconds"] += time.perf_counter() - t0
        return out

    # ------------------------------------------------------------------ #
    def synthesize(
        self,
        texts: str | Sequence[str],
        *,
        seed: int | Sequence[int] = 0,
        speaker_id: Optional[int | Sequence[int]] = None,
        trim: bool = True,
        max_redispatch: int = 3,
        noise_scale: Optional[float] = None,
        noise_scale_duration: Optional[float] = None,
        speaking_rate: Optional[float] = None,
    ):
        """Text(s) -> float32 PCM at ``config.sampling_rate``.

        A single string returns one 1-D array; a list returns a list of arrays
        (trimmed to each utterance's predicted length unless ``trim=False``).
        ``seed`` may be one int (whole-batch noise stream, HF-style) or one int
        per text (independent per-row streams; rows with equal seeds get equal
        noise).  The three control knobs default to the checkpoint config and
        are traced — overriding them does not recompile.
        """
        single = isinstance(texts, str)
        out = self.synthesize_raw(
            texts, seed=seed, speaker_id=speaker_id, max_redispatch=max_redispatch,
            noise_scale=noise_scale, noise_scale_duration=noise_scale_duration,
            speaking_rate=speaking_rate,
        )
        waves = out.waveform.astype(np.float32, copy=False)
        results = [
            waves[i, : out.lengths[i]] if trim else waves[i]
            for i in range(waves.shape[0])
        ]
        return results[0] if single else results

    def submit(
        self,
        texts: str | Sequence[str],
        *,
        seed: int | Sequence[int] = 0,
        speaker_id: Optional[int | Sequence[int]] = None,
        pad_to_batch: Optional[int] = None,
        noise_scale: Optional[float] = None,
        noise_scale_duration: Optional[float] = None,
        speaking_rate: Optional[float] = None,
    ) -> PendingSynthesis:
        """Dispatch synthesis WITHOUT blocking; pair with :meth:`collect`.

        Keep several submissions in flight to hide dispatch latency
        (throughput mode — see PendingSynthesis).
        """
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.tokenizer.encode(t) for t in texts]
        max_len = max((len(e) for e in encoded), default=1) or 1
        t_bucket = _next_bucket(self.engine.token_buckets, max_len)
        ids, mask = self.tokenizer.pad(encoded, pad_to=t_bucket)
        if pad_to_batch is not None and ids.shape[0] < pad_to_batch:
            pad_rows = pad_to_batch - ids.shape[0]
            ids = np.pad(ids, ((0, pad_rows), (0, 0)))
            mask = np.pad(mask, ((0, pad_rows), (0, 0)))

        spk = None
        if speaker_id is not None:
            spk = np.broadcast_to(
                np.asarray(speaker_id, dtype=np.int32), (ids.shape[0],)
            ).copy()

        if isinstance(seed, (int, np.integer)):
            rng = jax.random.PRNGKey(int(seed))
        else:
            # Per-row seeds folded into row keys: rows with different seeds
            # still share ONE dispatch (the server's mixed-seed batching).
            given = np.asarray(seed, np.int64)
            if given.shape != (len(texts),):
                raise ValueError(
                    f"seed list length {given.shape} != number of texts "
                    f"({len(texts)})")
            seeds = np.zeros((ids.shape[0],), np.int64)
            seeds[: len(texts)] = given
            # Fold 64-bit seeds as two 32-bit halves: a single fold_in would
            # truncate to int32 and alias seeds differing above bit 31.
            lo = jnp.asarray(seeds & 0xFFFFFFFF, jnp.uint32)
            hi = jnp.asarray((seeds >> 32) & 0xFFFFFFFF, jnp.uint32)
            base = jax.random.PRNGKey(0)
            rng = jax.vmap(
                lambda lo_, hi_: jax.random.fold_in(
                    jax.random.fold_in(base, lo_), hi_)
            )(lo, hi)
        controls = self._controls(noise_scale, noise_scale_duration, speaking_rate)
        num_frames = self.engine.frame_bucket(t_bucket)
        device_out = self._dispatch(ids, mask, num_frames, rng, spk, controls)
        # Start the device->host copies NOW: collect() always needs these
        # bytes, and kicking the DMA off at submit time overlaps the transfer
        # with the compute of later in-flight submissions (measured 3x on the
        # tunneled chip: 56 -> 19 ms/utterance at depth 4).
        for arr in device_out:
            try:
                arr.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                break
        return PendingSynthesis(device_out, ids, mask, num_frames, rng, spk, controls)

    @staticmethod
    def _fetch(device_out) -> EngineOutput:
        host = jax.device_get(device_out)
        wave = host[0]
        if wave.dtype == np.int16:
            wave = wave.astype(np.float32) / 32767.0
        return EngineOutput(wave, *host[1:])

    def collect(self, pending: PendingSynthesis, max_redispatch: int = 3) -> EngineOutput:
        """Block on a submission's single device->host fetch (+ overflow ladder)."""
        out = self._fetch(pending.device_out)
        predicted = int(out.frame_lengths.max())
        num_frames = pending.num_frames
        if predicted > num_frames:
            for attempt in range(max_redispatch):
                while num_frames < predicted:
                    num_frames *= 2
                self.stats["redispatches"] += 1
                device_out = self._dispatch(
                    pending.ids, pending.mask, num_frames,
                    pending.rng, pending.speaker, pending.controls,
                )
                # ladder attempts read only the tiny frame_lengths (not the
                # big waveform the attempt is about to discard)
                predicted = int(jax.device_get(device_out[2]).max())
                if predicted <= num_frames or attempt == max_redispatch - 1:
                    out = self._fetch(device_out)
                    break
        self.stats["audio_seconds"] += float(np.sum(out.lengths)) / self.config.sampling_rate
        return out

    def synthesize_raw(
        self,
        texts: str | Sequence[str],
        *,
        seed: int | Sequence[int] = 0,
        speaker_id: Optional[int | Sequence[int]] = None,
        max_redispatch: int = 3,
        pad_to_batch: Optional[int] = None,
        noise_scale: Optional[float] = None,
        noise_scale_duration: Optional[float] = None,
        speaking_rate: Optional[float] = None,
    ) -> EngineOutput:
        """Untrimmed batched output (host numpy) + per-row lengths.

        All device outputs are fetched with ONE ``jax.device_get`` — every
        separate blocking read is a full host<->device round-trip.
        """
        pending = self.submit(
            texts, seed=seed, speaker_id=speaker_id, pad_to_batch=pad_to_batch,
            noise_scale=noise_scale, noise_scale_duration=noise_scale_duration,
            speaking_rate=speaking_rate,
        )
        return self.collect(pending, max_redispatch=max_redispatch)

    # ------------------------------------------------------------------ #
    def warmup(self, batch_sizes=(1,), token_buckets=None, per_row_seeds=False):
        """Pre-compile the common dispatch shapes.

        ``per_row_seeds`` compiles the (B, 2) per-row key layout used when
        ``seed`` is passed as a LIST (the server always does) — a different
        program signature from the scalar-seed (2,) key layout.
        """
        buckets = token_buckets or self.engine.token_buckets
        for bs in batch_sizes:
            for tb in buckets:
                ids = np.zeros((bs, tb), np.int32)
                mask = np.zeros((bs, tb), np.float32)
                mask[:, 0] = 1.0
                if per_row_seeds:
                    base = jax.random.PRNGKey(0)
                    zeros = jnp.zeros((bs,), jnp.uint32)
                    rng = jax.vmap(
                        lambda lo_, hi_: jax.random.fold_in(
                            jax.random.fold_in(base, lo_), hi_)
                    )(zeros, zeros)
                else:
                    rng = jax.random.PRNGKey(0)
                out = self._dispatch(
                    ids, mask, self.engine.frame_bucket(tb), rng, None
                )
                jax.block_until_ready(out)
