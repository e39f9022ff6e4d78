"""The synthesis engine: bucketed static shapes, jit cache, batched dispatch.

This is the runtime the reference's orchestrator (vits.cpp:1101-1191) becomes
on TPU.  The reference rebuilds and re-executes a pointer graph per utterance
with a host read in the middle; here each (token-bucket, frame-capacity) pair
compiles ONCE, utterances are padded into the bucket, whole batches go through
a single dispatch, and the only host decision is made *after* the fact: if the
predicted frame count overflowed the chosen capacity, the engine re-dispatches
at the next capacity (rare — capacity defaults to 2.5 frames/token, past the
~2.2 frames/token MMS weights predict, and escalates geometrically).

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


def _matmul_precision_ctx(precision: Optional[str]):
    """jax.default_matmul_precision(...) at trace time, or a no-op.

    Applied around the traced model body so EngineConfig.matmul_precision
    stamps the glue (non-Pallas) matmuls/convs without touching process
    globals."""
    if precision is None:
        import contextlib

        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)


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
        mesh=None,  # jax.sharding.Mesh with a 'data' axis: multi-chip serving
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.engine = engine_config or EngineConfig()
        self.device = device
        if self.engine.compilation_cache_dir:
            # Serving restarts reuse compiled bucket programs from disk
            # (process-global; see EngineConfig.compilation_cache_dir).
            # Thresholds drop to 0 so even fast-compiling programs persist —
            # a serving process wants maximum restart reuse, not disk thrift.
            jax.config.update(
                "jax_compilation_cache_dir", self.engine.compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # Multi-chip serving: params replicate across the mesh, every batch
        # shards over the 'data' axis, XLA/GSPMD runs each row's synthesis on
        # its own chip (SURVEY.md §2b row 1 — the reference is single-process
        # CPU with batch==1 asserted, vits.cpp:184,303).
        self.mesh = mesh
        self._data_sharding = self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if device is not None:
                raise ValueError("pass either device= or mesh=, not both")
            from vits_tpu.parallel.mesh import DATA_AXIS

            if DATA_AXIS not in mesh.axis_names:
                raise ValueError(f"mesh needs a '{DATA_AXIS}' axis: {mesh}")
            self._data_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            self._replicated = NamedSharding(mesh, PartitionSpec())
        dtype = jnp.bfloat16 if self.engine.compute_dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dtype

        def _place(x):
            arr = jnp.asarray(x)
            if arr.dtype == jnp.float32 and dtype != jnp.float32:
                arr = arr.astype(dtype)
            if self._replicated is not None:
                return jax.device_put(arr, self._replicated)
            return jax.device_put(arr, device) if device is not None else arr

        self.params = {k: _place(v) for k, v in params.items()}
        use_pallas = self.engine.use_pallas_vocoder
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self._pallas_value_dtype = None
        if use_pallas and dtype == jnp.float32:
            # Kernel VMEM value dtype: bf16 by default (halves window/weight
            # VMEM traffic; fp32 accumulation unchanged); fp32 when the user
            # asked for a high-precision matmul tier.
            vd = self.engine.pallas_value_dtype
            if vd is None:
                vd = ("float32" if self.engine.pallas_precision
                      in ("high", "highest") else "bfloat16")
            self._pallas_value_dtype = vd
            # Packed-weight format: int8 when the checkpoint is quantized
            # (keeps the int8 HBM saving ON the pallas path — round-2 lost it
            # to fp32 packs), else match the value dtype.
            wf = self.engine.pallas_weight_format
            if wf is None:
                quantized = any(
                    k.startswith("decoder.") and k.endswith(".scale")
                    for k in self.params
                )
                wf = "int8" if quantized else vd
            # Pack the fused-kernel vocoder weights ONCE at load: in-trace
            # packing would re-run the shift-matrix scatters every dispatch
            # (models/hifigan.py::precompute_vocoder_packs).
            from vits_tpu.models.hifigan import precompute_vocoder_packs

            self.params.update(
                {k: _place(v) for k, v in
                 precompute_vocoder_packs(
                     self.params, config, weight_format=wf).items()})
        # Observability counters (the reference's verbose/log machinery,
        # vits.cpp:1234-1239, reimagined as structured stats).
        # compiled_shapes counts DISTINCT dispatch signatures (batch, tokens,
        # frames, rng layout) — jax compiles one program per such signature,
        # not one per frame bucket.
        self._dispatch_shapes: set = set()
        # Working frames/token ratio; starts at the config value and is bumped
        # by collect() when an overflow reveals the checkpoint's real rate
        # (EngineConfig.adaptive_capacity).  Observed per-dispatch rates feed
        # a sliding window so a raised ratio can DECAY once traffic stops
        # needing it (EngineConfig.adaptive_capacity_decay).
        self._frames_per_token = float(self.engine.frames_per_token)
        from collections import deque

        self._rate_window: deque = deque(
            maxlen=max(1, self.engine.adaptive_capacity_window))
        self.stats = {
            "dispatches": 0,
            "redispatches": 0,
            "compiled_shapes": 0,
            "audio_seconds": 0.0,
            "wall_seconds": 0.0,
        }
        # AOT program bundle: serve pre-exported StableHLO programs
        # (io/aot.py).  Verified against this model/engine before first use;
        # the bundle's frame ratio is adopted so dispatch frame capacities
        # line up with the exported programs.
        self._aot = None
        if self.engine.aot_bundle_dir:
            from vits_tpu.io.aot import AotBundle

            self._aot = AotBundle(self.engine.aot_bundle_dir)
            self._aot.verify(self)
            # Adopt the bundle's frame ratio exactly: dispatch capacities must
            # equal the exported programs' or every lookup misses.  If real
            # traffic still overflows, the ladder/adaptive path stays correct
            # (those re-dispatches fall back to jit and count as aot_misses).
            self._frames_per_token = self._aot.frames_per_token
            self.stats["aot_hits"] = 0
            self.stats["aot_misses"] = 0

    # ------------------------------------------------------------------ #
    @classmethod
    def load(
        cls,
        source,
        engine_config: Optional[EngineConfig] = None,
        device: Optional[jax.Device] = None,
        mesh=None,
    ) -> "Synthesizer":
        """Load from a .ggml path/bytes, an HF directory, or an HF hub name."""
        from vits_tpu.io import loader

        if isinstance(source, (bytes, bytearray)):
            config, tokenizer, params = loader.load_ggml(bytes(source))
        elif isinstance(source, str) and source.endswith(".ggml"):
            config, tokenizer, params = loader.load_ggml(source)
        else:
            config, tokenizer, params = loader.load_hf_pretrained(source)
        return cls(config, tokenizer, params, engine_config, device, mesh=mesh)

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

        def body(params, input_ids, input_mask, rng, speaker_id, controls):
            # controls = (noise_scale, noise_scale_duration, speaking_rate),
            # traced float32 scalars: per-call overrides never recompile
            # (the reference can only honor config values, vits.cpp:977-979).
            noise_scale, noise_scale_duration, speaking_rate = controls
            with _matmul_precision_ctx(self.engine.matmul_precision):
                out = synthesize_fn(
                    params, config, input_ids, input_mask, num_frames,
                    rng=rng, speaker_id=speaker_id, use_pallas=use_pallas,
                    pallas_precision=self.engine.pallas_precision,
                    use_pallas_flow=self.engine.use_pallas_flow,
                    use_pallas_attention=use_pallas_attention,
                    pallas_value_dtype=self._pallas_value_dtype,
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

        if self.mesh is None:
            return jax.jit(body)

        # --- mesh dispatch: shard_map over the 'data' axis ----------------- #
        # Plain jit+GSPMD would treat the Pallas custom-calls as unpartition-
        # able (all-gather in, replicate the vocoder on every chip); shard_map
        # runs the WHOLE per-row program manually per shard, so the fused
        # kernels stay on the multi-chip path.  Rows are independent — no
        # collectives — and per-row PRNG keys (required in mesh mode,
        # submit() enforces the layout) make every row's noise identical to
        # its single-chip draw.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh

        def mesh_run(params, input_ids, input_mask, rng, speaker_id, controls):
            assert jnp.ndim(rng) == 2, "mesh dispatch needs per-row PRNG keys"
            in_specs = (
                jax.tree.map(lambda _: P(), params),
                P("data"), P("data"), P("data"),
                None if speaker_id is None else P("data"),
                (P(), P(), P()),
            )
            out_specs = (P("data"), P("data"), P("data"), P("data"))
            return shard_map(
                body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )(params, input_ids, input_mask, rng, speaker_id, controls)

        return jax.jit(mesh_run)

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
        fn = None
        if self._aot is not None:
            fn = self._aot.lookup(
                ids.shape[0], ids.shape[1], num_frames,
                rng_rows=(np.ndim(rng) == 2), speaker=speaker_id is not None)
            self.stats["aot_hits" if fn is not None else "aot_misses"] += 1
        if fn is None:
            fn = self._compiled(num_frames)
        if controls is None:
            controls = self._controls(None, None, None)
        ids_dev = jnp.asarray(ids)
        mask_dev = jnp.asarray(mask, dtype=self.compute_dtype)
        rng_dev = rng
        spk_dev = speaker_id
        if self.mesh is not None:
            # Shard every leading-batch input over 'data'; scalar-key RNG and
            # the traced control scalars replicate.  GSPMD then partitions
            # the whole program row-wise — no collectives on this path (rows
            # are independent), so scaling is embarrassingly linear over ICI.
            put = jax.device_put
            ids_dev = put(ids_dev, self._data_sharding)
            mask_dev = put(mask_dev, self._data_sharding)
            rng_dev = put(
                jnp.asarray(rng),
                self._data_sharding if jnp.ndim(rng) == 2 else self._replicated,
            )
            if spk_dev is not None:
                spk_dev = put(jnp.asarray(spk_dev), self._data_sharding)
            controls = tuple(put(c, self._replicated) for c in controls)
        out = fn(
            self.params,
            ids_dev,
            mask_dev,
            rng_dev,
            spk_dev,
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
        n_texts = 1 if single else len(texts)
        out = self.synthesize_raw(
            texts, seed=seed, speaker_id=speaker_id, max_redispatch=max_redispatch,
            noise_scale=noise_scale, noise_scale_duration=noise_scale_duration,
            speaking_rate=speaking_rate,
        )
        waves = out.waveform.astype(np.float32, copy=False)
        # batch rows past n_texts are padding (mesh 'data'-axis rounding)
        results = [
            waves[i, : out.lengths[i]] if trim else waves[i]
            for i in range(min(n_texts, waves.shape[0]))
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
        if pad_to_batch is None and self.engine.batch_buckets:
            # batch bucketing: bound the compiled-program count over ragged
            # serving batch sizes (pad rows are masked + dropped on collect)
            pad_to_batch = _next_bucket(self.engine.batch_buckets, ids.shape[0])
        if pad_to_batch is not None and ids.shape[0] < pad_to_batch:
            pad_rows = pad_to_batch - ids.shape[0]
            ids = np.pad(ids, ((0, pad_rows), (0, 0)))
            mask = np.pad(mask, ((0, pad_rows), (0, 0)))
        if self.mesh is not None:
            # batch must tile the 'data' axis; pad rows are masked out
            d = self.mesh.shape["data"]
            short = -ids.shape[0] % d
            if short:
                ids = np.pad(ids, ((0, short), (0, 0)))
                mask = np.pad(mask, ((0, short), (0, 0)))

        spk = None
        if speaker_id is not None:
            # ids may have more rows than texts (pad_to_batch / mesh tiling):
            # tail-fill like the seeds array below — pad rows ride speaker 0
            # and are masked out of the output anyway.
            spk = np.zeros((ids.shape[0],), np.int32)
            arr = np.asarray(speaker_id, dtype=np.int32)
            if arr.ndim == 0:
                spk[:] = arr
            elif arr.shape == (len(texts),):
                spk[: len(texts)] = arr
            else:
                raise ValueError(
                    f"speaker_id list length {arr.shape} != number of texts "
                    f"({len(texts)})")

        if isinstance(seed, (int, np.integer)):
            if self.mesh is not None or (
                self.engine.batch_buckets and ids.shape[0] > 1
            ):
                # Mesh dispatch runs per-row programs under shard_map, which
                # cannot reproduce the single-key whole-batch noise stream —
                # expand a scalar seed to per-row keys (fold_in row index).
                # Deterministic, rows independent; audio differs from the
                # single-chip scalar-seed stream by construction.  Batch
                # bucketing takes the same contract for multi-row batches:
                # the single-key stream depends on the PADDED batch size,
                # while per-row keys make each row invariant to bucketing.
                base = jax.random.PRNGKey(int(seed))
                rng = jax.vmap(lambda r: jax.random.fold_in(base, r))(
                    jnp.arange(ids.shape[0], dtype=jnp.uint32))
            else:
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
        num_frames = self._frame_capacity(t_bucket)
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

    def _frame_capacity(self, token_bucket: int) -> int:
        """Frame capacity for a token bucket at the adaptively-raised ratio.

        In ``adaptive_capacity_align`` mode the raised ratio is base * 2^k by
        construction, and the capacity is computed as the BASE bucket
        capacity doubled k times — bit-identical to the ladder rungs
        ``warmup(overflow_ladder=N)`` compiled (rounding-to-8 does not
        commute with the doubling for every base ratio).
        """
        eng = self.engine
        if eng.adaptive_capacity_align and self._frames_per_token > eng.frames_per_token:
            scale = self._frames_per_token / eng.frames_per_token
            k = float(np.log2(scale))
            if abs(k - round(k)) < 1e-6:  # on-ladder ratio (base * 2^k)
                return eng.frame_bucket(token_bucket) * (2 ** max(0, int(round(k))))
            # off-ladder ratio (e.g. an AOT bundle floor): fall through to the
            # exact computation — the bundle shipped programs for that shape.
        return eng.frame_bucket(token_bucket, ratio=self._frames_per_token)

    def _observed_rate(self, pending: PendingSynthesis, frame_lengths):
        """Per-dispatch frames/token rate, or None for non-default controls.

        The observed rate is per-row predicted frames over per-row VALID
        tokens (mask sum) — the rate a full bucket of such text would need.
        A request that overrides ``speaking_rate`` or ``noise_scale_duration``
        perturbs its own durations and says nothing about the checkpoint's
        intrinsic frames/token: it is excluded from BOTH adaptation
        directions (it pays the redispatch ladder itself on overflow, and it
        must not vote a raised ratio back down either).
        """
        # Compare at float32: controls are traced f32 scalars while config
        # values are python floats (float32(0.9) != 0.9 at 1e-9 — an exact
        # compare would silently disable adaptation for such checkpoints).
        defaults = (self.config.noise_scale_duration, self.config.speaking_rate)
        observed = (pending.controls[1], pending.controls[2])
        for obs, dflt in zip(observed, defaults):
            if abs(float(obs) - float(np.float32(dflt))) > 1e-6:
                return None
        tokens = np.maximum(np.asarray(pending.mask, np.float32).sum(axis=1), 1.0)
        rate = float(np.max(np.asarray(frame_lengths, np.float32) / tokens))
        self._rate_window.append(rate)
        return rate

    def _aligned_ratio(self, rate: float, round_up: bool = True) -> float:
        """Smallest (largest, if ``round_up=False``) base * 2^k covering ``rate``."""
        base = float(self.engine.frames_per_token)
        if rate <= base:
            return base
        k = float(np.log2(rate / base))
        k = int(np.ceil(k - 1e-9)) if round_up else int(np.floor(k + 1e-9))
        return base * (2 ** max(0, k))

    def _observe_overflow(self, rate: float) -> None:
        """Raise the working frames/token ratio to cover an observed overflow.

        The rate is rounded up to ``adaptive_capacity_step`` so compiled
        shapes stay few.  Clamps against poisoning the engine-global ratio:
        one pathological utterance can raise it by at most 2x AND at most
        ``adaptive_capacity_request_max`` frames/token per overflow (repeated
        observations — i.e. a real traffic pattern — still converge on the
        true rate); and the ratio never exceeds ``adaptive_capacity_max``
        (real checkpoints sit at ~1.5-5 frames/token — beyond the cap is
        attack traffic, not a rate regime).
        """
        if not self.engine.adaptive_capacity or rate is None:
            return
        if self.engine.adaptive_capacity_align:
            # Ladder-aligned raises: the working ratio only takes values
            # base * 2^k, so (with the ladder warmed) every post-raise
            # dispatch shape is already compiled.  The 2x-per-overflow clamp
            # IS the per-request poisoning bound in this mode; the
            # adaptive_capacity_max ceiling applies as the largest rung that
            # does not exceed it (a raw min() would land off-ladder).
            bumped = min(self._aligned_ratio(rate),
                         self._frames_per_token * 2.0,
                         self._aligned_ratio(
                             float(self.engine.adaptive_capacity_max),
                             round_up=False))
        else:
            step = max(self.engine.adaptive_capacity_step, 1e-3)
            bumped = float(np.ceil(rate / step) * step)
            bumped = min(
                bumped,
                self._frames_per_token * 2.0,
                self._frames_per_token + float(
                    self.engine.adaptive_capacity_request_max),
                float(self.engine.adaptive_capacity_max),
            )
        if bumped > self._frames_per_token:
            self._frames_per_token = bumped
            # Decay needs a FULL window of post-raise evidence before it may
            # undo this raise.
            self._rate_window.clear()

    def _maybe_decay(self) -> None:
        """Fall back toward the config ratio when traffic stops needing it.

        Runs once a full window of default-control dispatches has been
        observed since the last raise; the ratio drops to what the window's
        worst request actually needed (rounded up to the step), floored at
        the config value — and at the AOT bundle's ratio when serving from a
        bundle, whose exported frame capacities the engine must keep hitting.
        """
        eng = self.engine
        if not (eng.adaptive_capacity and eng.adaptive_capacity_decay):
            return
        floor = float(eng.frames_per_token)
        if self._aot is not None:
            floor = max(floor, float(self._aot.frames_per_token))
        if self._frames_per_token <= floor:
            return
        if len(self._rate_window) < self._rate_window.maxlen:
            return
        if eng.adaptive_capacity_align:
            # Decay along the same ladder rungs raises use — never to an
            # unwarmed intermediate capacity.
            target = max(floor, self._aligned_ratio(max(self._rate_window)))
        else:
            step = max(eng.adaptive_capacity_step, 1e-3)
            target = max(floor, float(np.ceil(max(self._rate_window) / step) * step))
        if target < self._frames_per_token:
            self._frames_per_token = target
            self._rate_window.clear()  # fresh evidence before the next move

    def collect(self, pending: PendingSynthesis, max_redispatch: int = 3) -> EngineOutput:
        """Block on a submission's single device->host fetch (+ overflow ladder)."""
        out = self._fetch(pending.device_out)
        predicted = int(out.frame_lengths.max())
        num_frames = pending.num_frames
        rate = self._observed_rate(pending, out.frame_lengths)
        if predicted <= num_frames:
            self._maybe_decay()
        else:
            self._observe_overflow(rate)
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
    @functools.lru_cache(maxsize=None)  # noqa: B019 — engine owns its cache
    def _compiled_convert(self, num_frames: int):
        """Voice-conversion program at a static frame capacity (jit-cached)."""
        from vits_tpu.models.vits import voice_convert

        config = self.config
        use_pallas = self.engine.use_pallas_vocoder
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        transfer_int16 = self.engine.transfer_int16

        def body(params, spec, frame_mask, src, tgt, rng, noise_scale):
            with _matmul_precision_ctx(self.engine.matmul_precision):
                out = voice_convert(
                    params, config, spec, frame_mask,
                    source_speaker_id=src, target_speaker_id=tgt,
                    rng=rng, noise_scale=noise_scale,
                    use_pallas=use_pallas,
                    pallas_precision=self.engine.pallas_precision,
                    pallas_value_dtype=self._pallas_value_dtype,
                )
            wave = out.waveform
            if transfer_int16:
                wave = jnp.round(
                    jnp.clip(wave.astype(jnp.float32), -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
            return wave

        if self.mesh is None:
            return jax.jit(body)

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh

        def mesh_run(params, spec, frame_mask, src, tgt, rng, noise_scale):
            in_specs = (
                jax.tree.map(lambda _: P(), params),
                P("data"), P("data"),
                None if src is None else P("data"),
                None if tgt is None else P("data"),
                P("data"), P(),
            )
            return shard_map(
                body, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
                check_rep=False,
            )(params, spec, frame_mask, src, tgt, rng, noise_scale)

        return jax.jit(mesh_run)

    def convert_voice(
        self,
        audio: np.ndarray | Sequence[np.ndarray],
        *,
        source_speaker: Optional[int | Sequence[int]] = None,
        target_speaker: Optional[int | Sequence[int]] = None,
        seed: int = 0,
        noise_scale: float = 0.0,
        trim: bool = True,
    ):
        """Voice conversion: source audio -> the same speech in a target voice.

        ``audio`` is one 1-D float32 waveform at ``config.sampling_rate`` (or a
        list; returns a list).  The source spectrogram is framed exactly like
        training data (hop = total_upsample, n_fft = 2*(spectrogram_bins-1)) so
        posterior frames align 1:1 with vocoder latent frames.  The default
        ``noise_scale=0`` converts from the posterior MEAN — deterministic;
        raise it (VITS trains at 1.0) for sampled conversions seeded by
        ``seed``.  Frame capacities are bucketed and jit-cached like synthesis
        dispatches; on a mesh engine the batch shards over the 'data' axis.
        """
        from vits_tpu.train.data import linear_spectrogram

        single = isinstance(audio, np.ndarray) and np.ndim(audio) == 1
        waves_in = [audio] if single else list(audio)
        hop = self.config.total_upsample
        n_fft = 2 * (self.config.spectrogram_bins - 1)
        pad = (n_fft - hop) // 2
        specs = []
        for a in waves_in:
            a = np.asarray(a, np.float32).reshape(-1)
            # reflect-pad needs len > pad; conversion needs >= 1 frame
            floor = max(hop, pad + 1)
            if len(a) < floor:
                a = np.pad(a, (0, floor - len(a)))
            n_frames = len(a) // hop
            specs.append(linear_spectrogram(a[: n_frames * hop], n_fft, hop)[:n_frames])

        batch = len(specs)
        if self.mesh is not None:
            batch += -batch % self.mesh.shape["data"]
        max_frames = max(s.shape[0] for s in specs)
        frame_buckets = [
            self._frame_capacity(tb) for tb in self.engine.token_buckets
        ]
        capacity = _next_bucket(frame_buckets, max_frames)
        spec = np.zeros((batch, capacity, self.config.spectrogram_bins), np.float32)
        mask = np.zeros((batch, capacity), np.float32)
        for i, s in enumerate(specs):
            spec[i, : s.shape[0]] = s
            mask[i, : s.shape[0]] = 1.0

        def _speakers(value, name):
            if value is None:
                return None
            arr = np.asarray(value, np.int32)
            out = np.zeros((batch,), np.int32)
            if arr.ndim == 0:
                out[:] = arr
            elif arr.shape == (len(waves_in),):
                out[: len(waves_in)] = arr
            else:
                raise ValueError(
                    f"{name} list length {arr.shape} != number of inputs "
                    f"({len(waves_in)})")
            return out

        src = _speakers(source_speaker, "source_speaker")
        tgt = _speakers(target_speaker, "target_speaker")
        base = jax.random.PRNGKey(int(seed))
        rng = jax.vmap(lambda r: jax.random.fold_in(base, r))(
            jnp.arange(batch, dtype=jnp.uint32))

        fn = self._compiled_convert(capacity)
        spec_dev = jnp.asarray(spec, dtype=self.compute_dtype)
        mask_dev = jnp.asarray(mask, dtype=self.compute_dtype)
        rng_dev, src_dev, tgt_dev = rng, src, tgt
        scale_dev = jnp.float32(noise_scale)
        if self.mesh is not None:
            put = jax.device_put
            spec_dev = put(spec_dev, self._data_sharding)
            mask_dev = put(mask_dev, self._data_sharding)
            rng_dev = put(rng_dev, self._data_sharding)
            if src_dev is not None:
                src_dev = put(jnp.asarray(src_dev), self._data_sharding)
            if tgt_dev is not None:
                tgt_dev = put(jnp.asarray(tgt_dev), self._data_sharding)
            scale_dev = put(scale_dev, self._replicated)

        # per-row keys vmapped inside voice_convert's noise draw
        def _run():
            return fn(self.params, spec_dev, mask_dev, src_dev, tgt_dev,
                      rng_dev, scale_dev)

        wave = np.asarray(jax.device_get(_run()))
        if wave.dtype == np.int16:
            wave = wave.astype(np.float32) / 32767.0
        else:
            wave = wave.astype(np.float32, copy=False)  # bf16 engines
        self.stats["dispatches"] += 1
        results = []
        for i in range(len(waves_in)):
            n = specs[i].shape[0] * hop
            results.append(wave[i, :n] if trim else wave[i])
        return results[0] if single else results

    # ------------------------------------------------------------------ #
    def warmup(self, batch_sizes=(1,), token_buckets=None, per_row_seeds=False,
               overflow_ladder: int = 0):
        """Pre-compile the common dispatch shapes.

        ``per_row_seeds`` compiles the (B, 2) per-row key layout used when
        ``seed`` is passed as a LIST (the server always does) — a different
        program signature from the scalar-seed (2,) key layout.

        ``overflow_ladder=N`` additionally compiles the first N rungs of the
        overflow-redispatch ladder (capacity doubled N times, matching
        ``collect``'s escalation) for every (batch, bucket) pair — so the
        first utterance whose predicted length overflows the working
        capacity redispatches into an already-compiled program instead of
        paying a synchronous XLA compile (~20-40 s on TPU) at request time.
        """
        buckets = token_buckets or self.engine.token_buckets
        for bs in batch_sizes:
            if self.mesh is not None:  # batch must tile the 'data' axis
                d = self.mesh.shape["data"]
                bs = -(-bs // d) * d
            for tb in buckets:
                ids = np.zeros((bs, tb), np.int32)
                mask = np.zeros((bs, tb), np.float32)
                mask[:, 0] = 1.0
                if per_row_seeds or self.mesh is not None:
                    base = jax.random.PRNGKey(0)
                    zeros = jnp.zeros((bs,), jnp.uint32)
                    rng = jax.vmap(
                        lambda lo_, hi_: jax.random.fold_in(
                            jax.random.fold_in(base, lo_), hi_)
                    )(zeros, zeros)
                else:
                    rng = jax.random.PRNGKey(0)
                capacity = self._frame_capacity(tb)
                for rung in range(overflow_ladder + 1):
                    out = self._dispatch(
                        ids, mask, capacity * (2 ** rung), rng, None
                    )
                    jax.block_until_ready(out)
