"""VITS generator training step — jittable, mesh-shardable.

The reference has no training path (SURVEY.md §5); this implements the VITS
generator objective end-to-end in one XLA program:

    text --encoder--> prior stats        spec --posterior--> z, (m_q, logs_q)
    z --flow(fwd)--> z_p
    MAS(log N(z_p; prior)) --> alignment --> durations + aligned prior
    losses: KL + SDP duration NLL + 45 * mel-L1 on a random decoded segment

Sharding: batch rides the 'data' mesh axis, wide channel dims optionally ride
'model' (see vits_tpu.parallel.mesh); under jit XLA inserts the psums/gathers.
Discriminator (adversarial) training is layered on top in round 2.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.models.duration import stochastic_duration_predictor_nll
from vits_tpu.models.encoder import text_encoder
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.posterior import posterior_encoder
from vits_tpu.ops.align import monotonic_align, prior_log_likelihood
from vits_tpu.train.losses import (
    kl_divergence,
    random_segment_starts,
    slice_segments,
)
from vits_tpu.utils.mel import log_mel_spectrogram


class TrainBatch(NamedTuple):
    """One padded batch. S = spectrogram frames, T = tokens."""

    input_ids: jax.Array  # (B, T) int32
    token_mask: jax.Array  # (B, T) float
    spectrogram: jax.Array  # (B, S, spectrogram_bins) linear spec of target audio
    frame_mask: jax.Array  # (B, S) float
    audio: jax.Array  # (B, S * total_upsample) float target waveform
    speaker_id: Optional[jax.Array] = None  # (B,) int32


class TrainMetrics(NamedTuple):
    loss: jax.Array
    kl: jax.Array
    duration: jax.Array
    mel: jax.Array


def generator_forward(
    params: dict,
    config: VitsConfig,
    batch: TrainBatch,
    rng: jax.Array,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    mel_kwargs: Optional[dict] = None,
    use_pallas: bool = False,
):
    """Forward pass with reconstruction losses.

    Returns (total_recon_loss, metrics, wave_hat, audio_slices) so adversarial
    terms can be layered on (make_gan_train_step).
    """
    mel_kwargs = dict(mel_kwargs or {})
    mel_kwargs.setdefault("sample_rate", config.sampling_rate)
    p = ParamView(params)
    k_post, k_dur, k_seg = jax.random.split(rng, 3)
    token_mask3 = batch.token_mask[..., None]
    frame_mask3 = batch.frame_mask[..., None]
    B, S, _ = batch.spectrogram.shape

    speaker_embeddings = None
    if config.num_speakers > 1 and batch.speaker_id is not None:
        emb = jnp.take(p["embed_speaker.weight"], batch.speaker_id, axis=0)
        speaker_embeddings = emb[:, None, :]

    # --- posterior + flow forward ---------------------------------------- #
    post_noise = jax.random.normal(k_post, (B, S, config.flow_size), batch.spectrogram.dtype)
    z, m_q, logs_q = posterior_encoder(
        p, config, batch.spectrogram, frame_mask3, post_noise, speaker_embeddings
    )
    z_p, _ = residual_coupling_block(
        p, config, z, frame_mask3, speaker_embeddings, reverse=False
    )

    # --- text prior + MAS alignment --------------------------------------- #
    # use_pallas: flash rel-attention with the flash backward kernel
    # (ops/pallas/attention_grad.py) from 512 tokens up — measured break-even
    # at 256 and 1.3x/2.7x at 512/1024 vs XLA autodiff (BENCH_DETAIL
    # attention_grad_r3); the token length is static at trace time
    use_flash_attn = use_pallas and batch.input_ids.shape[1] >= 512
    enc = text_encoder(p, config, batch.input_ids, token_mask3, batch.token_mask,
                       use_pallas=use_flash_attn, trainable=True)
    log_lik = prior_log_likelihood(z_p, enc.prior_means, enc.prior_log_variances)
    attn = jax.lax.stop_gradient(
        monotonic_align(log_lik, batch.frame_mask, batch.token_mask)
    )  # (B, S, T)
    durations = jnp.sum(attn, axis=1)  # (B, T)

    m_p = jnp.einsum("bst,btc->bsc", attn, enc.prior_means)
    logs_p = jnp.einsum("bst,btc->bsc", attn, enc.prior_log_variances)

    loss_kl = kl_divergence(z_p, logs_q, m_p, logs_p, batch.frame_mask)

    # --- duration NLL ------------------------------------------------------ #
    hidden = jax.lax.stop_gradient(enc.last_hidden_state)
    dur_noise = jax.random.normal(k_dur, (B, batch.input_ids.shape[1], 2), hidden.dtype)
    dur_nll = stochastic_duration_predictor_nll(
        p, config, hidden, token_mask3, durations[..., None],
        dur_noise, speaker_embeddings,
    )
    loss_dur = jnp.sum(dur_nll) / jnp.maximum(jnp.sum(batch.token_mask), 1.0)

    # --- mel reconstruction on a random decoded segment -------------------- #
    frame_lengths = jnp.sum(batch.frame_mask, axis=-1).astype(jnp.int32)
    starts = random_segment_starts(k_seg, frame_lengths, segment_frames)
    z_slice = slice_segments(z, starts, segment_frames)
    # use_pallas: wide vocoder stages run the custom-VJP fused trio kernel
    # (ops/pallas/trio_grad.py) — fused forward, exact XLA backward over the
    # kernel-saved activations.  Round 2 trained XLA-only here.
    wave_hat = hifigan(p, config, z_slice, None, speaker_embeddings,
                       use_pallas=use_pallas, trainable=True)

    up = config.total_upsample
    audio_slices = slice_segments(
        batch.audio.reshape(B, S, up), starts, segment_frames
    ).reshape(B, segment_frames * up)
    mel_hat = log_mel_spectrogram(wave_hat, **mel_kwargs)
    mel_ref = log_mel_spectrogram(audio_slices, **mel_kwargs)
    loss_mel = jnp.mean(jnp.abs(mel_hat - mel_ref))

    total = loss_kl + loss_dur + mel_weight * loss_mel
    metrics = TrainMetrics(loss=total, kl=loss_kl, duration=loss_dur, mel=loss_mel)
    return total, metrics, wave_hat, audio_slices


def generator_loss(
    params: dict,
    config: VitsConfig,
    batch: TrainBatch,
    rng: jax.Array,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    mel_kwargs: Optional[dict] = None,
    use_pallas: bool = False,
):
    total, metrics, _, _ = generator_forward(
        params, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
        use_pallas=use_pallas,
    )
    return total, metrics


def _resolve_use_pallas(use_pallas):
    if use_pallas is None:
        # Auto-on only for single-chip TPU training: under a multi-device
        # mesh the train step runs plain jit+GSPMD, which treats Pallas
        # custom-calls as unpartitionable (it would all-gather the batch and
        # replicate the kernel per chip).  Multi-chip callers can still force
        # use_pallas=True knowingly.
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    return use_pallas


def make_train_step(
    config: VitsConfig,
    optimizer: Any,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    mel_kwargs: Optional[dict] = None,
    donate: bool = True,
    use_pallas: Optional[bool] = None,  # None = auto: on for SINGLE-CHIP
    #   TPU only (_resolve_use_pallas — GSPMD can't partition the
    #   custom-call under a mesh); True forces it anywhere
):
    """Build a jitted (params, opt_state, batch, rng) -> (params, opt_state, metrics).

    Pass params/opt_state placed on a mesh (vits_tpu.parallel.mesh.shard_params)
    and a batch sharded over the 'data' axis; XLA handles the rest.
    """
    use_pallas = _resolve_use_pallas(use_pallas)

    def step(params, opt_state, batch: TrainBatch, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda prm: generator_loss(
                prm, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
                use_pallas=use_pallas,
            ),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


class GanTrainMetrics(NamedTuple):
    gen_loss: jax.Array
    disc_loss: jax.Array
    kl: jax.Array
    duration: jax.Array
    mel: jax.Array
    adversarial: jax.Array
    feature_matching: jax.Array


def make_gan_train_step(
    config: VitsConfig,
    gen_optimizer: Any,
    disc_optimizer: Any,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    fm_weight: float = 2.0,
    mel_kwargs: Optional[dict] = None,
    donate: bool = True,
    reuse_forward: bool = True,
    use_pallas: Optional[bool] = None,  # None = auto: on for SINGLE-CHIP
    #   TPU only (_resolve_use_pallas — GSPMD can't partition the
    #   custom-call under a mesh); True forces it anywhere
):
    """Full adversarial VITS step: discriminator update, then generator update.

    Signature: (gen_params, disc_params, gen_opt_state, disc_opt_state, batch,
    rng) -> same-shaped states + GanTrainMetrics.  Matches the VITS recipe —
    D trained on (real, stop-grad fake) first, G then trained through the
    updated D with LSGAN + feature-matching + reconstruction losses.

    ``reuse_forward=True`` (default) runs the generator forward ONCE per step:
    its vjp is captured before the D update and the adversarial head's
    cotangents are pulled back through it afterwards — numerically identical
    to the two-forward formulation (pinned in tests) at ~0.55x the generator
    cost.  ``False`` keeps the naive two-forward step for comparison.
    """
    from vits_tpu.models.discriminator import discriminate
    from vits_tpu.train.losses import (
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
    )

    use_pallas = _resolve_use_pallas(use_pallas)

    def _update_d(disc_params, disc_opt_state, wave_real, wave_fake):
        def d_loss_fn(dp):
            real_logits, _ = discriminate(dp, wave_real)
            fake_logits, _ = discriminate(dp, wave_fake)
            return discriminator_loss(real_logits, fake_logits)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
        d_updates, disc_opt_state = disc_optimizer.update(
            d_grads, disc_opt_state, disc_params
        )
        return optax.apply_updates(disc_params, d_updates), disc_opt_state, d_loss

    def step_reuse(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng):
        # ---- ONE generator forward, vjp captured ------------------------ #
        def gen_fn(gp):
            recon, metrics, fake, real = generator_forward(
                gp, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
                use_pallas=use_pallas,
            )
            # `real` is sliced from batch.audio (no gp dependence): aux.
            return (recon, fake), (metrics, real)

        (recon, wave_fake), gen_vjp, (metrics, wave_real) = jax.vjp(
            gen_fn, gen_params, has_aux=True
        )

        disc_params, disc_opt_state, d_loss = _update_d(
            disc_params, disc_opt_state, wave_real, jax.lax.stop_gradient(wave_fake)
        )

        # ---- adversarial head on the SAME fake, grads pulled back ------- #
        def head(recon_in, fake_in):
            real_logits, real_feats = discriminate(disc_params, wave_real)
            fake_logits, fake_feats = discriminate(disc_params, fake_in)
            adv = generator_adversarial_loss(fake_logits)
            fm = feature_matching_loss(real_feats, fake_feats)
            return recon_in + adv + fm_weight * fm, (adv, fm)

        (g_loss, (adv, fm)), head_grads = jax.value_and_grad(
            head, argnums=(0, 1), has_aux=True
        )(recon, wave_fake)
        (g_grads,) = gen_vjp(head_grads)
        g_updates, gen_opt_state = gen_optimizer.update(
            g_grads, gen_opt_state, gen_params
        )
        gen_params = optax.apply_updates(gen_params, g_updates)
        return (
            gen_params, disc_params, gen_opt_state, disc_opt_state,
            g_loss, d_loss, metrics, adv, fm,
        )

    def step_naive(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng):
        # ---- generator forward (no grad yet) for the D update ---------- #
        _, _, wave_fake, wave_real = generator_forward(
            gen_params, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
            use_pallas=use_pallas,
        )
        disc_params, disc_opt_state, d_loss = _update_d(
            disc_params, disc_opt_state, wave_real, jax.lax.stop_gradient(wave_fake)
        )

        # ---- generator update through the updated discriminator -------- #
        def g_loss_fn(gp):
            recon, metrics, fake, real = generator_forward(
                gp, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
                use_pallas=use_pallas,
            )
            real_logits, real_feats = discriminate(disc_params, real)
            fake_logits, fake_feats = discriminate(disc_params, fake)
            adv = generator_adversarial_loss(fake_logits)
            fm = feature_matching_loss(real_feats, fake_feats)
            total = recon + adv + fm_weight * fm
            return total, (metrics, adv, fm)

        (g_loss, (metrics, adv, fm)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_params)
        g_updates, gen_opt_state = gen_optimizer.update(
            g_grads, gen_opt_state, gen_params
        )
        gen_params = optax.apply_updates(gen_params, g_updates)
        return (
            gen_params, disc_params, gen_opt_state, disc_opt_state,
            g_loss, d_loss, metrics, adv, fm,
        )

    inner = step_reuse if reuse_forward else step_naive

    def step(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng):
        (
            gen_params, disc_params, gen_opt_state, disc_opt_state,
            g_loss, d_loss, metrics, adv, fm,
        ) = inner(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng)

        out_metrics = GanTrainMetrics(
            gen_loss=g_loss,
            disc_loss=d_loss,
            kl=metrics.kl,
            duration=metrics.duration,
            mel=metrics.mel,
            adversarial=adv,
            feature_matching=fm,
        )
        return gen_params, disc_params, gen_opt_state, disc_opt_state, out_metrics

    donate_argnums = (0, 1, 2, 3) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
