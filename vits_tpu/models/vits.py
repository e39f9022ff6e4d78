"""Full VITS synthesis pipeline as ONE static-shape jittable function.

This replaces the reference's two-phase dynamic-graph orchestrator
(/root/reference/src/vits.cpp:975-1191): there, graph 1 computes durations, the
host reads ``predicted_length`` (vits.cpp:1133), and graph 2 is *rebuilt* at
that length.  Under XLA that host round-trip would force a recompile per
utterance; instead the whole pipeline runs at a static frame capacity chosen by
the engine (length bucketing), the duration-driven length regulation becomes a
one-hot alignment matmul (MXU) fully inside the program, and the predicted
length comes out as a tensor the caller uses to slice the waveform.

Noise enters explicitly: either a `jax.random` key (split internally) or
recorded noise arrays via :class:`NoiseOverride` — the TPU-native replacement
for the reference's graph-build-time RNG (ggml-util.h:189-199), and the hook
that makes bit-parity testing against torch possible (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.models.duration import (
    duration_predictor,
    stochastic_duration_predictor_reverse,
)
from vits_tpu.models.encoder import text_encoder
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.posterior import posterior_encoder


class NoiseOverride(NamedTuple):
    """Concrete standard-normal draws, in the order HF/torch draws them."""

    duration: jax.Array  # (B, T_in, 2)
    prior: jax.Array  # (B, T_frames, flow_size)


class SynthesisOutput(NamedTuple):
    waveform: jax.Array  # (B, T_frames * total_upsample) float32 PCM in [-1, 1]
    lengths: jax.Array  # (B,) int32 — valid samples per row (clamped to capacity)
    frame_lengths: jax.Array  # (B,) int32 — predicted frames, UNclamped; a value
    #   > num_frames tells the engine to re-dispatch at a larger bucket
    latents: jax.Array  # (B, T_frames, flow_size) — the flow output ("spectrogram")
    log_duration: jax.Array  # (B, T_in, 1)


def align_durations(
    duration: jax.Array,  # (B, T_in) float, integral values, 0 at padded tokens
    input_mask: jax.Array,  # (B, T_in)
    num_frames: int,
) -> tuple[jax.Array, jax.Array]:
    """Duration -> one-hot alignment (B, num_frames, T_in) plus frame mask.

    attn[b, f, t] = 1 iff frame f belongs to token t, i.e.
    cum_dur[t-1] <= f < cum_dur[t].  Expressed as a difference of cumulative
    comparisons like the reference's compare/pad/sub construction
    (vits.cpp:1028-1041) — but batched, static-shape, and consumed by a single
    MXU matmul instead of a rebuilt graph.
    """
    cum_duration = jnp.cumsum(duration, axis=-1)  # (B, T_in)
    frames = jnp.arange(num_frames, dtype=duration.dtype)  # (F,)
    # valid[b, f, t] = f < cum_dur[b, t]
    valid = (frames[None, :, None] < cum_duration[:, None, :]).astype(duration.dtype)
    prev = jnp.pad(valid, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    attn = (valid - prev) * input_mask[:, None, :]
    total = jnp.minimum(cum_duration[:, -1], float(num_frames))
    frame_mask = (frames[None, :] < total[:, None]).astype(duration.dtype)
    attn = attn * frame_mask[:, :, None]
    return attn, frame_mask


class LatentsOutput(NamedTuple):
    """Result of the text -> flow-latents stage (pre-vocoder)."""

    latents: jax.Array  # (B, T_frames, flow_size)
    frame_mask: jax.Array  # (B, T_frames)
    total_duration: jax.Array  # (B,) float — UNclamped predicted frames
    log_duration: jax.Array  # (B, T_in, 1)
    speaker_embeddings: Optional[jax.Array]


class PriorOutput(NamedTuple):
    """Result of the text -> sampled-prior stage (pre-flow, pre-vocoder).

    The flow and vocoder are both frame-local conv stacks, so everything
    after this point can run on chunked windows (streaming TTFA); everything
    up to here is global (attention over tokens) but cheap.
    """

    prior_latents: jax.Array  # (B, T_frames, flow_size)
    frame_mask: jax.Array  # (B, T_frames)
    total_duration: jax.Array  # (B,)
    log_duration: jax.Array  # (B, T_in, 1)
    speaker_embeddings: Optional[jax.Array]


def text_to_prior(
    params: dict,
    config: VitsConfig,
    input_ids: jax.Array,  # (B, T_in) int32
    input_mask: jax.Array,  # (B, T_in) float32, 1=token 0=pad
    num_frames: int,  # static latent-frame capacity
    rng: Optional[jax.Array] = None,
    noise: Optional[NoiseOverride] = None,
    speaker_id: Optional[jax.Array] = None,
    noise_scale: Optional[float | jax.Array] = None,
    noise_scale_duration: Optional[float | jax.Array] = None,
    speaking_rate: Optional[float | jax.Array] = None,
    use_pallas_attention: bool = False,
    pallas_precision: Optional[str] = None,
) -> PriorOutput:
    """Text -> sampled prior latents (encoder, SDP, alignment, prior draw).

    ``noise_scale``/``noise_scale_duration``/``speaking_rate`` may be Python
    floats (baked into the program) or traced scalar arrays — the engine
    passes them traced so per-call control changes do NOT recompile.
    ``rng`` is either one PRNG key (one draw for the whole batch, as HF does)
    or a per-row key array of shape (B, 2) — the engine folds per-request
    seeds into row keys so mixed-seed traffic shares a single dispatch.
    """
    p = ParamView(params)
    noise_scale = config.noise_scale if noise_scale is None else noise_scale
    noise_scale_duration = (
        config.noise_scale_duration if noise_scale_duration is None else noise_scale_duration
    )
    speaking_rate = config.speaking_rate if speaking_rate is None else speaking_rate

    batch, t_in = input_ids.shape
    padding_mask = input_mask[..., None]

    if noise is None:
        if rng is None:
            raise ValueError("provide either rng key or NoiseOverride")
        dtype = input_mask.dtype
        if rng.ndim == 2:  # (B, 2) per-row keys

            def _draw(k):
                kd, kp = jax.random.split(k)
                return (
                    jax.random.normal(kd, (t_in, 2), dtype),
                    jax.random.normal(kp, (num_frames, config.flow_size), dtype),
                )

            dur_noise, prior_noise = jax.vmap(_draw)(rng)
            noise = NoiseOverride(duration=dur_noise, prior=prior_noise)
        else:
            k_dur, k_prior = jax.random.split(rng)
            noise = NoiseOverride(
                duration=jax.random.normal(k_dur, (batch, t_in, 2), dtype),
                prior=jax.random.normal(
                    k_prior, (batch, num_frames, config.flow_size), dtype
                ),
            )

    speaker_embeddings = None
    if config.num_speakers > 1 and speaker_id is not None:
        emb = jnp.take(p["embed_speaker.weight"], speaker_id, axis=0)  # (B, emb)
        speaker_embeddings = emb[:, None, :]  # (B, 1, emb)

    # ---- Text encoder -> prior stats -------------------------------------- #
    # attention has no vocoder-stage axis: a per-stage spec collapses to
    # its strongest tier (ops/precision.py)
    from vits_tpu.ops.precision import reduce_precision

    enc = text_encoder(p, config, input_ids, padding_mask, input_mask,
                       use_pallas=use_pallas_attention,
                       pallas_precision=reduce_precision(pallas_precision))

    # ---- Durations -------------------------------------------------------- #
    hidden = jax.lax.stop_gradient(enc.last_hidden_state)
    if config.use_stochastic_duration_prediction:
        log_duration = stochastic_duration_predictor_reverse(
            p, config, hidden, padding_mask,
            noise.duration, noise_scale_duration, speaker_embeddings,
        )
    else:
        log_duration = duration_predictor(p, config, hidden, padding_mask, speaker_embeddings)

    # Duration/alignment bookkeeping always runs in float32: bf16 cannot
    # represent integers above 256 exactly, so cumsum/arange/comparisons in
    # the compute dtype would mis-assign frames on longer utterances.
    length_scale = 1.0 / speaking_rate
    duration = jnp.ceil(
        jnp.exp(log_duration.astype(jnp.float32))
        * padding_mask.astype(jnp.float32)
        * length_scale
    )[..., 0]
    total_duration = jnp.clip(jnp.sum(duration, axis=-1), min=1.0)

    # ---- Static-shape length regulation (vits.cpp:1021-1057 recast) ------- #
    attn, frame_mask = align_durations(
        duration, input_mask.astype(jnp.float32), num_frames
    )
    attn = attn.astype(enc.prior_means.dtype)
    frame_mask = frame_mask.astype(enc.prior_means.dtype)
    prior_means = jnp.einsum("bft,btc->bfc", attn, enc.prior_means)
    prior_log_variances = jnp.einsum("bft,btc->bfc", attn, enc.prior_log_variances)

    # ---- Prior sample ------------------------------------------------------ #
    # noise_scale arrives as a traced fp32 scalar (per-call control); cast to
    # the compute dtype so bf16 runs stay bf16 end-to-end.
    prior_latents = (
        prior_means
        + noise.prior
        * jnp.exp(prior_log_variances)
        * jnp.asarray(noise_scale, prior_means.dtype)
    )
    return PriorOutput(
        prior_latents=prior_latents,
        frame_mask=frame_mask,
        total_duration=total_duration,
        log_duration=log_duration,
        speaker_embeddings=speaker_embeddings,
    )


def latents_from_prior(
    params: dict,
    config: VitsConfig,
    prior_latents: jax.Array,  # (B, F, flow_size) — may be a chunk window
    frame_mask3: jax.Array,  # (B, F, 1)
    speaker_embeddings: Optional[jax.Array] = None,
    use_pallas: bool = False,
    pallas_precision: Optional[str] = None,
) -> jax.Array:
    """Sampled prior -> flow latents (reverse residual-coupling stack).

    Frame-local: the flow is 4 couplings of 4 k=5 dilation-1 wavenet layers
    (half receptive field 4*2*4 = 32 frames), so it can run on overlapping
    windows for streaming — interiors match the full-length run exactly.

    With ``use_pallas`` the whole 4-coupling stack runs as ONE fused kernel
    (ops/pallas/flow.py) instead of ~170 XLA ops.
    """
    p = ParamView(params)
    if use_pallas:
        from vits_tpu.ops.pallas.flow import (
            fused_flow, pack_flow_cond, pack_flow_weights,
        )

        packed, type_a = pack_flow_weights(p, config)
        cond = (
            pack_flow_cond(p, config, speaker_embeddings)
            if speaker_embeddings is not None
            else None
        )
        from vits_tpu.ops.precision import reduce_precision

        lengths = jnp.sum(frame_mask3[..., 0], axis=1).astype(jnp.int32)
        latents = fused_flow(
            prior_latents, packed, type_a, config,
            lengths=lengths, cond=cond,
            precision=reduce_precision(pallas_precision),
        )
        return latents * frame_mask3
    latents, _ = residual_coupling_block(
        p, config, prior_latents, frame_mask3, speaker_embeddings, reverse=True
    )
    return latents * frame_mask3


def text_to_latents(
    params: dict,
    config: VitsConfig,
    input_ids: jax.Array,
    input_mask: jax.Array,
    num_frames: int,
    rng: Optional[jax.Array] = None,
    noise: Optional[NoiseOverride] = None,
    speaker_id: Optional[jax.Array] = None,
    noise_scale: Optional[float | jax.Array] = None,
    noise_scale_duration: Optional[float | jax.Array] = None,
    speaking_rate: Optional[float | jax.Array] = None,
    use_pallas: bool = False,
    pallas_precision: Optional[str] = None,
    use_pallas_attention: bool = False,
) -> LatentsOutput:
    """Text -> flow latents (prior stage + full-length flow)."""
    prior = text_to_prior(
        params, config, input_ids, input_mask, num_frames,
        rng=rng, noise=noise, speaker_id=speaker_id,
        noise_scale=noise_scale, noise_scale_duration=noise_scale_duration,
        speaking_rate=speaking_rate,
        use_pallas_attention=use_pallas_attention,
        pallas_precision=pallas_precision,
    )
    latents = latents_from_prior(
        params, config, prior.prior_latents, prior.frame_mask[..., None],
        prior.speaker_embeddings,
        use_pallas=use_pallas, pallas_precision=pallas_precision,
    )
    return LatentsOutput(
        latents=latents,
        frame_mask=prior.frame_mask,
        total_duration=prior.total_duration,
        log_duration=prior.log_duration,
        speaker_embeddings=prior.speaker_embeddings,
    )


def synthesize(
    params: dict,
    config: VitsConfig,
    input_ids: jax.Array,
    input_mask: jax.Array,
    num_frames: int,
    rng: Optional[jax.Array] = None,
    noise: Optional[NoiseOverride] = None,
    speaker_id: Optional[jax.Array] = None,
    noise_scale: Optional[float] = None,
    noise_scale_duration: Optional[float] = None,
    speaking_rate: Optional[float] = None,
    use_pallas: bool = False,
    pallas_precision: Optional[str] = None,
    use_pallas_flow: bool = False,
    use_pallas_attention: bool = False,
    pallas_value_dtype: Optional[str] = None,
) -> SynthesisOutput:
    """Full text -> waveform pipeline (latents stage + vocoder) in one program.

    ``use_pallas`` routes the vocoder through the fused Pallas kernels (a
    measured win); ``use_pallas_flow`` routes the coupling flow through
    ops/pallas/flow.py — correct but measured slightly SLOWER than XLA at
    standard shapes (BENCH_DETAIL.json flow_kernel entry), so it is a
    separate opt-in.
    """
    p = ParamView(params)
    lat = text_to_latents(
        params, config, input_ids, input_mask, num_frames,
        rng=rng, noise=noise, speaker_id=speaker_id,
        noise_scale=noise_scale, noise_scale_duration=noise_scale_duration,
        speaking_rate=speaking_rate,
        use_pallas=use_pallas_flow, pallas_precision=pallas_precision,
        use_pallas_attention=use_pallas_attention,
    )
    frame_mask3 = lat.frame_mask[..., None]
    waveform = hifigan(
        p, config, lat.latents, frame_mask3, lat.speaker_embeddings,
        use_pallas=use_pallas, pallas_precision=pallas_precision,
        pallas_value_dtype=pallas_value_dtype,
    )

    frame_lengths = jnp.minimum(lat.total_duration, float(num_frames)).astype(jnp.int32)
    lengths = frame_lengths * config.total_upsample
    return SynthesisOutput(
        waveform=waveform,
        lengths=lengths,
        frame_lengths=jnp.clip(lat.total_duration, max=2_147_483_000.0).astype(jnp.int32),
        latents=lat.latents,
        log_duration=lat.log_duration,
    )


class VoiceConversionOutput(NamedTuple):
    waveform: jax.Array  # (B, F * total_upsample) float32 PCM in [-1, 1]
    latents: jax.Array  # (B, F, flow_size) target-speaker vocoder latents
    posterior_mean: jax.Array  # (B, F, flow_size) source posterior mean


def voice_convert(
    params: dict,
    config: VitsConfig,
    spectrogram: jax.Array,  # (B, F, spectrogram_bins) linear |STFT| of source audio
    frame_mask: jax.Array,  # (B, F) 1=real frame 0=pad
    source_speaker_id: Optional[jax.Array] = None,  # (B,) int32
    target_speaker_id: Optional[jax.Array] = None,  # (B,) int32
    rng: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,  # (B, F, flow_size) standard normal
    noise_scale: float | jax.Array = 1.0,
    use_pallas: bool = False,
    pallas_precision: Optional[str] = None,
    pallas_value_dtype: Optional[str] = None,
) -> VoiceConversionOutput:
    """Voice conversion: re-synthesize source audio in a target speaker's voice.

    A capability of the VITS architecture the reference engine never exposes
    (its posterior encoder and forward-flow direction are inference-dead code;
    the C++ flow asserts reverse-only and every ``global_conditioning`` branch
    is ``ASSERT(false)`` — /root/reference/src/vits.cpp:461,472,503,603).  The
    chain is the original-VITS voice_conversion path: posterior-encode the
    source spectrogram under the SOURCE speaker, run the coupling flow FORWARD
    (audio latents -> speaker-independent prior frame), then REVERSE under the
    TARGET speaker and vocode with the target embedding.

    ``noise_scale=0`` (or ``noise=None`` with no rng) converts from the
    posterior mean — deterministic conversion.  The whole function is one
    static-shape jittable program; the engine buckets F like synthesis frames.
    """
    p = ParamView(params)
    frame_mask3 = frame_mask[..., None]

    def _embed(speaker_id):
        if config.num_speakers > 1 and speaker_id is not None:
            emb = jnp.take(p["embed_speaker.weight"], speaker_id, axis=0)
            return emb[:, None, :]
        return None

    g_src = _embed(source_speaker_id)
    g_tgt = _embed(target_speaker_id)

    if noise is None:
        shape = (*spectrogram.shape[:2], config.flow_size)
        if rng is None:
            noise = jnp.zeros(shape, spectrogram.dtype)
        elif rng.ndim == 2:  # (B, 2) per-row keys (mesh/engine layout)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, shape[1:], spectrogram.dtype)
            )(rng)
        else:
            noise = jax.random.normal(rng, shape, spectrogram.dtype)
    noise = noise * jnp.asarray(noise_scale, noise.dtype)

    z, post_mean, _ = posterior_encoder(
        ParamView(params), config, spectrogram, frame_mask3, noise, g_src
    )
    # audio latents -> speaker-independent prior frame (training direction)
    z_p, _ = residual_coupling_block(p, config, z, frame_mask3, g_src, reverse=False)
    # prior frame -> target-speaker latents (the usual inference direction)
    latents = latents_from_prior(
        params, config, z_p, frame_mask3, g_tgt,
        pallas_precision=pallas_precision,
    )
    waveform = hifigan(
        p, config, latents, frame_mask3, g_tgt,
        use_pallas=use_pallas, pallas_precision=pallas_precision,
        pallas_value_dtype=pallas_value_dtype,
    )
    return VoiceConversionOutput(
        waveform=waveform, latents=latents, posterior_mean=post_mean
    )
