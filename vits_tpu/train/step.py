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


def _resolve_compute_dtype(compute_dtype):
    """None / fp32 -> None (full precision); anything else -> jnp dtype."""
    if compute_dtype is None:
        return None
    dt = jnp.dtype(compute_dtype)
    return None if dt == jnp.float32 else dt


def _cast_floats(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype`` (ints untouched).

    Leaves go through jnp.asarray: a NUMPY bfloat16 array (ml_dtypes) follows
    numpy's promotion rules — ``1.0 - np_bf16`` silently yields float32 —
    while a jnp bf16 array keeps bf16 under JAX's weak typing.  Eager callers
    (tests) would otherwise diverge from the jitted path.
    """
    return jax.tree.map(
        lambda x: jnp.asarray(x).astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


# Generator subtrees that run in the training compute dtype.  The text
# encoder and the HiFiGAN decoder are where the generator's FLOPs are (MXU
# matmul/conv work); the posterior encoder, coupling flow, and stochastic
# duration predictor stay fp32 — they are LOG-DOMAIN math (log-variances the
# KL exponentiates, spline log-determinants, flow NLL terms) whose bf16
# rounding was measured to destabilize the losses outright, for a negligible
# share of step FLOPs.
_BF16_SUBTREES = ("text_encoder.", "decoder.")


def _cast_generator_params(params: dict, dtype) -> dict:
    return {
        k: (jnp.asarray(v).astype(dtype)
            if k.startswith(_BF16_SUBTREES) and jnp.issubdtype(v.dtype, jnp.floating)
            else v)
        for k, v in params.items()
    }


def _stack_microbatches(batch: TrainBatch, n: int) -> TrainBatch:
    """(B, ...) batch -> (n, B/n, ...) microbatch stack for lax.scan."""
    B = batch.input_ids.shape[0]
    if B % n:
        raise ValueError(f"batch size {B} not divisible by grad_accum={n}")

    def r(x):
        return None if x is None else x.reshape((n, B // n) + x.shape[1:])

    return TrainBatch(*(r(x) for x in batch))


def _microbatch_keys(rng: jax.Array, n: int) -> jax.Array:
    """One PRNG key per microbatch: fold_in(rng, i) — deterministic given rng."""
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(n))


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_scale(t, s: float):
    return jax.tree.map(lambda x: x * s, t)


def generator_forward(
    params: dict,
    config: VitsConfig,
    batch: TrainBatch,
    rng: jax.Array,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    mel_kwargs: Optional[dict] = None,
    use_pallas: bool = False,
    compute_dtype=None,
    encoder_fn=None,
):
    """Forward pass with reconstruction losses.

    Returns (total_recon_loss, metrics, wave_hat, audio_slices) so adversarial
    terms can be layered on (make_gan_train_step).

    ``compute_dtype="bfloat16"`` runs the FLOP-heavy generator modules — the
    text encoder and the HiFiGAN decoder (_BF16_SUBTREES) — in bf16; master
    params stay fp32 (grads flow back through the cast, so ``jax.grad`` w.r.t.
    the fp32 params is fp32).  The posterior encoder, coupling flow, and SDP
    stay fp32: their log-domain math (exponentiated log-variances, spline
    log-dets) is precision-critical and a negligible FLOP share.  Loss
    reductions are anchored to fp32 regardless: alignment log-likelihoods,
    KL, duration-NLL sums, and the log-mel (FFT) all upcast first.  bf16
    needs no loss scaling (same exponent range as fp32).
    """
    mel_kwargs = dict(mel_kwargs or {})
    mel_kwargs.setdefault("sample_rate", config.sampling_rate)
    cd = _resolve_compute_dtype(compute_dtype)
    if cd is not None:
        params = _cast_generator_params(params, cd)
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
    # bf16 params need bf16 masks (an fp32 mask would promote every encoder
    # activation back to fp32); the jnp cast keeps JAX weak-typing semantics.
    enc_mask3 = jnp.asarray(token_mask3).astype(cd) if cd is not None else token_mask3
    enc_mask = (jnp.asarray(batch.token_mask).astype(cd)
                if cd is not None else batch.token_mask)
    if encoder_fn is not None:
        # Alternate encoder implementation over the same math — used by the
        # pipeline-parallel path (parallel/pipeline.py), whose params carry
        # the layer stack in stage-stacked layout.
        enc = encoder_fn(params, config, batch.input_ids, enc_mask3, enc_mask)
    else:
        enc = text_encoder(p, config, batch.input_ids, enc_mask3, enc_mask,
                           use_pallas=use_flash_attn, trainable=True)
    # fp32 anchor: MAS runs cumulative max/sum recurrences over all frames —
    # bf16 log-likelihoods would drift the hard alignment itself.
    log_lik = prior_log_likelihood(
        z_p, enc.prior_means, enc.prior_log_variances
    ).astype(jnp.float32)
    frame_mask32 = batch.frame_mask.astype(jnp.float32)
    token_mask32 = batch.token_mask.astype(jnp.float32)
    attn = jax.lax.stop_gradient(
        monotonic_align(log_lik, frame_mask32, token_mask32)
    )  # (B, S, T) fp32
    durations = jnp.sum(attn, axis=1)  # (B, T) fp32 (exact small integers)

    m_p = jnp.einsum("bst,btc->bsc", attn, enc.prior_means)
    logs_p = jnp.einsum("bst,btc->bsc", attn, enc.prior_log_variances)

    loss_kl = kl_divergence(z_p, logs_q, m_p, logs_p, batch.frame_mask)

    # --- duration NLL ------------------------------------------------------ #
    # SDP runs fp32 (log-domain flow): upcast the (stop-grad) encoder hidden.
    hidden = jax.lax.stop_gradient(enc.last_hidden_state).astype(jnp.float32)
    dur_noise = jax.random.normal(k_dur, (B, batch.input_ids.shape[1], 2), hidden.dtype)
    dur_nll = stochastic_duration_predictor_nll(
        p, config, hidden, token_mask3, durations[..., None].astype(hidden.dtype),
        dur_noise, speaker_embeddings,
    )
    loss_dur = jnp.sum(dur_nll.astype(jnp.float32)) / jnp.maximum(
        jnp.sum(token_mask32), 1.0
    )

    # --- mel reconstruction on a random decoded segment -------------------- #
    # fp32 frame lengths: a bf16 mask sum rounds above 256 frames.
    frame_lengths = jnp.sum(frame_mask32, axis=-1).astype(jnp.int32)
    starts = random_segment_starts(k_seg, frame_lengths, segment_frames)
    z_slice = slice_segments(z, starts, segment_frames)
    # use_pallas: wide vocoder stages run the custom-VJP fused trio kernel
    # (ops/pallas/trio_grad.py) — fused forward, exact XLA backward over the
    # kernel-saved activations.  Round 2 trained XLA-only here.
    if cd is not None:
        z_slice = z_slice.astype(cd)  # decoder params are bf16
        if speaker_embeddings is not None:
            spk_dec = speaker_embeddings.astype(cd)
        else:
            spk_dec = None
    else:
        spk_dec = speaker_embeddings
    wave_hat = hifigan(p, config, z_slice, None, spk_dec,
                       use_pallas=use_pallas, trainable=True)

    up = config.total_upsample
    audio_slices = slice_segments(
        batch.audio.reshape(B, S, up), starts, segment_frames
    ).reshape(B, segment_frames * up)
    # fp32 anchor: the STFT (rfft) and log run in full precision either way.
    mel_hat = log_mel_spectrogram(wave_hat.astype(jnp.float32), **mel_kwargs)
    mel_ref = log_mel_spectrogram(audio_slices.astype(jnp.float32), **mel_kwargs)
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
    compute_dtype=None,
):
    total, metrics, _, _ = generator_forward(
        params, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
        use_pallas=use_pallas, compute_dtype=compute_dtype,
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
    grad_accum: int = 1,
    compute_dtype=None,  # "bfloat16": bf16 model math, fp32 master params,
    #   fp32 loss reductions (see generator_forward)
    opt_shardings=None,  # ZeRO-1: pytree of NamedShardings for opt_state
    #   (parallel.mesh.opt_state_shardings) — moments stay sharded over 'data'
):
    """Build a jitted (params, opt_state, batch, rng) -> (params, opt_state, metrics).

    Pass params/opt_state placed on a mesh (vits_tpu.parallel.mesh.shard_params)
    and a batch sharded over the 'data' axis; XLA handles the rest.

    ``grad_accum=N`` splits the batch into N microbatches and lax.scans over
    them, averaging gradients before ONE optimizer update — the activation
    memory of a B/N batch with the optimizer statistics of a full-B batch.
    Microbatch i draws its noise from fold_in(rng, i).

    ``opt_shardings`` pins the returned opt_state to ZeRO-1 shardings so GSPMD
    keeps the moment update partitioned over 'data' (pass the initial state
    through parallel.mesh.shard_opt_state to match).
    """
    use_pallas = _resolve_use_pallas(use_pallas)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def loss_fn(prm, mb, key):
        return generator_loss(
            prm, config, mb, key, segment_frames, mel_weight, mel_kwargs,
            use_pallas=use_pallas, compute_dtype=compute_dtype,
        )

    def step(params, opt_state, batch: TrainBatch, rng):
        if grad_accum == 1:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
        else:
            micro = _stack_microbatches(batch, grad_accum)
            keys = _microbatch_keys(rng, grad_accum)

            def body(acc, xs):
                mb, key = xs
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, key
                )
                return _tree_add(acc, g), m

            acc, ms = jax.lax.scan(
                body, jax.tree.map(jnp.zeros_like, params), (micro, keys)
            )
            grads = _tree_scale(acc, 1.0 / grad_accum)
            metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if opt_shardings is not None:
            opt_state = jax.lax.with_sharding_constraint(opt_state, opt_shardings)
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
    grad_accum: int = 1,
    compute_dtype=None,  # "bfloat16": bf16 model math (generator AND
    #   discriminator), fp32 master params/optimizer, fp32 loss reductions
    gen_opt_shardings=None,  # ZeRO-1 shardings for the two optimizer states
    disc_opt_shardings=None,  # (parallel.mesh.opt_state_shardings)
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

    ``grad_accum=N`` scans N microbatches per phase (D grads accumulated and
    applied, then G grads accumulated through the UPDATED D and applied) —
    per-microbatch it is the two-forward formulation: reusing the forward
    across the D update would require keeping every microbatch's vjp residuals
    alive, the exact memory accumulation exists to avoid.  Microbatch i draws
    noise from fold_in(rng, i), so the same fakes the D phase saw are
    re-created for the G phase.
    """
    from vits_tpu.models.discriminator import discriminate
    from vits_tpu.train.losses import (
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
    )

    use_pallas = _resolve_use_pallas(use_pallas)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    cd = _resolve_compute_dtype(compute_dtype)

    def _cast_disc(dp):
        # Discriminator params ride the same compute dtype as the waveforms
        # the generator hands it; master copies stay fp32 (grads flow back
        # through the cast).
        return _cast_floats(dp, cd) if cd is not None else dp

    def _cast_wave(w):
        # real waves come from the fp32 batch; fakes are already bf16
        return w.astype(cd) if cd is not None else w

    def _update_d(disc_params, disc_opt_state, wave_real, wave_fake):
        def d_loss_fn(dp):
            dpc = _cast_disc(dp)
            real_logits, _ = discriminate(dpc, _cast_wave(wave_real))
            fake_logits, _ = discriminate(dpc, _cast_wave(wave_fake))
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
                use_pallas=use_pallas, compute_dtype=compute_dtype,
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
            dpc = _cast_disc(disc_params)
            real_logits, real_feats = discriminate(dpc, _cast_wave(wave_real))
            fake_logits, fake_feats = discriminate(dpc, _cast_wave(fake_in))
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
            use_pallas=use_pallas, compute_dtype=compute_dtype,
        )
        disc_params, disc_opt_state, d_loss = _update_d(
            disc_params, disc_opt_state, wave_real, jax.lax.stop_gradient(wave_fake)
        )

        # ---- generator update through the updated discriminator -------- #
        def g_loss_fn(gp):
            recon, metrics, fake, real = generator_forward(
                gp, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
                use_pallas=use_pallas, compute_dtype=compute_dtype,
            )
            dpc = _cast_disc(disc_params)
            real_logits, real_feats = discriminate(dpc, _cast_wave(real))
            fake_logits, fake_feats = discriminate(dpc, _cast_wave(fake))
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

    def step_accum(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng):
        micro = _stack_microbatches(batch, grad_accum)
        keys = _microbatch_keys(rng, grad_accum)

        def fwd(gp, mb, key):
            return generator_forward(
                gp, config, mb, key, segment_frames, mel_weight, mel_kwargs,
                use_pallas=use_pallas, compute_dtype=compute_dtype,
            )

        # ---- phase 1: D grads over every microbatch, ONE D update -------- #
        def d_loss_fn(dp, real, fake):
            dpc = _cast_disc(dp)
            real_logits, _ = discriminate(dpc, _cast_wave(real))
            fake_logits, _ = discriminate(dpc, _cast_wave(fake))
            return discriminator_loss(real_logits, fake_logits)

        def d_body(acc, xs):
            mb, key = xs
            _, _, fake, real = fwd(gen_params, mb, key)
            dl, dg = jax.value_and_grad(d_loss_fn)(
                disc_params, real, jax.lax.stop_gradient(fake)
            )
            return _tree_add(acc, dg), dl

        d_acc, d_losses = jax.lax.scan(
            d_body, jax.tree.map(jnp.zeros_like, disc_params), (micro, keys)
        )
        d_updates, disc_opt_state = disc_optimizer.update(
            _tree_scale(d_acc, 1.0 / grad_accum), disc_opt_state, disc_params
        )
        disc_params = optax.apply_updates(disc_params, d_updates)

        # ---- phase 2: G grads through the UPDATED D, ONE G update --------- #
        # Same folded keys -> the same fakes the D phase trained against.
        def g_loss_fn(gp, mb, key):
            recon, metrics, fake, real = fwd(gp, mb, key)
            dpc = _cast_disc(disc_params)
            real_logits, real_feats = discriminate(dpc, _cast_wave(real))
            fake_logits, fake_feats = discriminate(dpc, _cast_wave(fake))
            adv = generator_adversarial_loss(fake_logits)
            fm = feature_matching_loss(real_feats, fake_feats)
            return recon + adv + fm_weight * fm, (metrics, adv, fm)

        def g_body(acc, xs):
            mb, key = xs
            (gl, (m, adv, fm)), gg = jax.value_and_grad(g_loss_fn, has_aux=True)(
                gen_params, mb, key
            )
            return _tree_add(acc, gg), (gl, m, adv, fm)

        g_acc, (g_losses, ms, advs, fms) = jax.lax.scan(
            g_body, jax.tree.map(jnp.zeros_like, gen_params), (micro, keys)
        )
        g_updates, gen_opt_state = gen_optimizer.update(
            _tree_scale(g_acc, 1.0 / grad_accum), gen_opt_state, gen_params
        )
        gen_params = optax.apply_updates(gen_params, g_updates)

        metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        return (
            gen_params, disc_params, gen_opt_state, disc_opt_state,
            jnp.mean(g_losses), jnp.mean(d_losses), metrics,
            jnp.mean(advs), jnp.mean(fms),
        )

    if grad_accum > 1:
        inner = step_accum
    else:
        inner = step_reuse if reuse_forward else step_naive

    def step(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng):
        (
            gen_params, disc_params, gen_opt_state, disc_opt_state,
            g_loss, d_loss, metrics, adv, fm,
        ) = inner(gen_params, disc_params, gen_opt_state, disc_opt_state, batch, rng)
        if gen_opt_shardings is not None:
            gen_opt_state = jax.lax.with_sharding_constraint(
                gen_opt_state, gen_opt_shardings)
        if disc_opt_shardings is not None:
            disc_opt_state = jax.lax.with_sharding_constraint(
                disc_opt_state, disc_opt_shardings)

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
