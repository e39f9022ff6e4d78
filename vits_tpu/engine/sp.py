"""Time-axis (sequence-parallel) sharded decode: one utterance, many chips.

The dp mesh engine scales THROUGHPUT (one utterance per chip per dispatch);
this scales single-utterance LATENCY: the flow + HiFiGAN vocoder — >95% of
device time, and frame-local conv stacks — run on N chips at once, each chip
decoding a contiguous slice of the latent frames.  This is SURVEY.md §5-8's
"sharding the time axis across chips with halo exchange for conv receptive
fields", realized the XLA way:

  * the sampled prior is tiny ((F, 192) floats ~ KBs/s of audio), so it
    REPLICATES — the "halo exchange" collapses to each chip slicing its
    window (shard + 2*margin frames) from the replicated prior with
    ``lax.dynamic_slice`` at ``axis_index``; no ppermute needed because the
    boundary data is already resident.  The expensive tensors (256x-upsampled
    vocoder activations) are the ones that stay sharded.
  * each chip decodes its window and keeps the interior ``shard`` frames;
    margins are recomputed-and-discarded, exactly like the streaming
    decoder's overlap-discard (engine/streaming.py) — interiors of
    feed-forward conv stacks are exact given receptive-field context.
  * boundary shards see zero frames with zero mask where the utterance
    starts/ends; every conv re-zeroes masked positions (the same mask
    propagation that makes padded batch rows bit-identical to solo runs),
    so a masked zero margin is indistinguishable from conv zero padding —
    output is SAMPLE-EXACT vs one-shot synthesis (tests/test_sp.py).

The reference has no counterpart (single CPU process, one giant graph,
vits.cpp:1101-1191); its long-utterance latency is linear in length with no
recourse.  Here a paragraph decodes ~N x faster on an N-chip mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.io.params import ParamView
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.vits import latents_from_prior, text_to_prior


class ShardedDecoder:
    """Decode single utterances with the time axis sharded over a mesh.

    Usage::

        mesh = make_mesh(data=8, model=1)
        sp = ShardedDecoder(model, mesh=mesh)
        audio = sp.synthesize("a very long paragraph ...")

    ``margin_frames``/``flow_margin_frames`` follow the streaming decoder's
    receptive-field analysis (vocoder ~16 latent frames for MMS, flow exactly
    32; defaults carry the same safety margin).
    """

    def __init__(
        self,
        synthesizer,
        mesh=None,
        margin_frames: int = 20,
        flow_margin_frames: int = 40,
    ):
        from vits_tpu.parallel.mesh import DATA_AXIS

        self.synth = synthesizer
        self.axis = DATA_AXIS
        mesh = mesh if mesh is not None else synthesizer.mesh
        if mesh is None:
            raise ValueError("ShardedDecoder needs a mesh (pass mesh= or use "
                             "a mesh-constructed Synthesizer)")
        if self.axis not in mesh.axis_names:
            raise ValueError(f"mesh needs a '{self.axis}' axis: {mesh}")
        self.mesh = mesh
        self.n_shards = mesh.shape[self.axis]
        self.total_margin = margin_frames + flow_margin_frames
        # Params must live replicated on THIS mesh.  A mesh-constructed
        # synthesizer already has them there; otherwise place a replicated
        # copy (weights only move once).
        from jax.sharding import NamedSharding, PartitionSpec

        self._replicated = NamedSharding(mesh, PartitionSpec())
        if synthesizer.mesh is mesh:
            self._params = synthesizer.params
        else:
            self._params = jax.device_put(synthesizer.params, self._replicated)
        self._prior_fn_cache: dict = {}
        self._decode_fn_cache: dict = {}

    # ------------------------------------------------------------------ #
    def _prior_fn(self, num_frames: int):
        """Full-utterance prior program (identical math to the engine's)."""
        if num_frames not in self._prior_fn_cache:
            synth = self.synth
            config = synth.config
            engine = synth.engine
            use_pallas_attention = engine.use_pallas_attention
            if use_pallas_attention is None:
                use_pallas_attention = jax.default_backend() == "tpu"

            @jax.jit
            def run(params, ids, mask, rng, speaker_id, controls):
                noise_scale, noise_scale_duration, speaking_rate = controls
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

    def _decode_fn(self, num_frames: int, has_speaker: bool):
        """shard_map'd flow+vocoder: replicated prior in, time-sharded PCM out."""
        key = (num_frames, has_speaker)
        if key not in self._decode_fn_cache:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            synth = self.synth
            config = synth.config
            engine = synth.engine
            use_pallas = engine.use_pallas_vocoder
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            n, m = self.n_shards, self.total_margin
            shard = -(-num_frames // n)  # ceil: every chip the same window
            window = shard + 2 * m
            up = config.total_upsample
            axis = self.axis

            def body(params, prior_pad, mask_pad, spk):
                # prior_pad: (B, m + shard*n + m, C) replicated; this chip's
                # window starts at axis_index*shard (margins included by the
                # +2m padding).
                start = jax.lax.axis_index(axis) * shard
                piece = jax.lax.dynamic_slice_in_dim(
                    prior_pad, start, window, axis=1)
                mpiece = jax.lax.dynamic_slice_in_dim(
                    mask_pad, start, window, axis=1)[..., None]
                latents = latents_from_prior(
                    params, config, piece, mpiece, spk,
                    use_pallas=engine.use_pallas_flow,
                    pallas_precision=engine.pallas_precision,
                )
                wave = hifigan(
                    ParamView(params), config, latents, mpiece, spk,
                    use_pallas=use_pallas,
                    pallas_precision=engine.pallas_precision,
                    pallas_value_dtype=synth._pallas_value_dtype,
                )
                # keep the interior; margins are other chips' (or padding's)
                return wave[:, m * up:(m + shard) * up]

            in_specs = (
                jax.tree.map(lambda _: P(), self._params),
                P(), P(), P() if has_speaker else None,
            )
            fn = shard_map(
                body, mesh=self.mesh, in_specs=in_specs,
                out_specs=P(None, axis), check_rep=False,
            )
            self._decode_fn_cache[key] = jax.jit(fn)
        return self._decode_fn_cache[key]

    # ------------------------------------------------------------------ #
    def synthesize(
        self,
        text: str,
        seed: int = 0,
        speaker_id: Optional[int] = None,
        noise_scale: Optional[float] = None,
        noise_scale_duration: Optional[float] = None,
        speaking_rate: Optional[float] = None,
        trim: bool = True,
    ) -> np.ndarray:
        """Synthesize one utterance with flow+vocoder sharded over the mesh.

        Sample-exact vs ``Synthesizer.synthesize(transfer_int16=False)`` for
        the same seed/controls (pinned in tests/test_sp.py)."""
        synth = self.synth
        from vits_tpu.engine.synthesizer import _next_bucket

        encoded = synth.tokenizer.encode(text)
        t_bucket = _next_bucket(synth.engine.token_buckets, max(len(encoded), 1))
        ids, mask = synth.tokenizer.pad([encoded], pad_to=t_bucket)
        num_frames = synth._frame_capacity(t_bucket)
        spk = None if speaker_id is None else np.asarray([speaker_id], np.int32)
        rng = jax.random.PRNGKey(seed)
        controls = synth._controls(
            noise_scale, noise_scale_duration, speaking_rate)

        put = lambda x: jax.device_put(jnp.asarray(x), self._replicated)
        prior = self._prior_fn(num_frames)(
            self._params, put(ids),
            put(np.asarray(mask, np.float32)), put(rng),
            None if spk is None else put(spk), tuple(put(c) for c in controls),
        )
        # Overflow ladder, like the engine/streaming paths.
        for _ in range(4):
            predicted = int(np.asarray(prior.total_duration)[0])
            if predicted <= num_frames:
                break
            while num_frames < predicted:
                num_frames *= 2
            prior = self._prior_fn(num_frames)(
                self._params, put(ids),
                put(np.asarray(mask, np.float32)), put(rng),
                None if spk is None else put(spk),
                tuple(put(c) for c in controls),
            )
        valid_frames = min(predicted, num_frames)

        n, m = self.n_shards, self.total_margin
        shard = -(-num_frames // n)
        pad_tail = shard * n - num_frames
        prior_pad = jnp.pad(
            prior.prior_latents, ((0, 0), (m, m + pad_tail), (0, 0)))
        mask_pad = jnp.pad(prior.frame_mask, ((0, 0), (m, m + pad_tail)))
        wave = self._decode_fn(num_frames, spk is not None)(
            self._params, put(prior_pad), put(mask_pad),
            prior.speaker_embeddings if spk is not None else None,
        )
        wave = np.asarray(wave)[0]
        if trim:
            wave = wave[: valid_frames * synth.config.total_upsample]
        return wave
