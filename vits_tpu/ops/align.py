"""Monotonic Alignment Search (MAS) as a jittable lax.scan dynamic program.

VITS training aligns latent frames to text tokens by finding the best monotonic
path through a per-(frame, token) log-likelihood matrix.  The original
implementation is a Cython CPU loop and the reference has no training at all;
here the Viterbi forward pass is a ``lax.scan`` over frames (vectorized over
batch and tokens on the VPU) and the backtrace is a second scan using recorded
argmax choices — fully static shapes, mask-aware, differentiable-free (the
path is used as a constant target, as in VITS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def monotonic_align(
    log_likelihood: jax.Array,  # (B, S_frames, T_tokens)
    frame_mask: jax.Array,  # (B, S_frames) 1/0
    token_mask: jax.Array,  # (B, T_tokens) 1/0
) -> jax.Array:
    """Best monotonic path -> one-hot alignment (B, S_frames, T_tokens).

    Each valid frame is assigned exactly one token; token indices are
    non-decreasing along frames; the path starts at token 0 and ends at each
    row's last valid token.
    """
    B, S, T = log_likelihood.shape
    fmask = frame_mask.astype(bool)
    tmask = token_mask.astype(bool)
    s_len = jnp.sum(frame_mask, axis=-1).astype(jnp.int32)  # (B,)
    t_len = jnp.sum(token_mask, axis=-1).astype(jnp.int32)  # (B,)

    ll = jnp.where(tmask[:, None, :], log_likelihood, _NEG_INF)

    token_idx = jnp.arange(T)

    # ---- forward: val[b, t] = best score of any path ending at (s, t) ----- #
    def forward(val_prev, ll_s):
        shifted = jnp.pad(val_prev, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :-1]
        take_diag = shifted >= val_prev  # came from t-1 (diagonal move)
        best = jnp.maximum(val_prev, shifted)
        val = ll_s + best
        return val, take_diag

    val0 = jnp.where(token_idx[None, :] == 0, ll[:, 0, :], _NEG_INF)
    ll_rest = jnp.moveaxis(ll[:, 1:, :], 1, 0)  # (S-1, B, T)
    _, choices = jax.lax.scan(forward, val0, ll_rest)
    # choices: (S-1, B, T) — for frame s (1-based), True = diagonal move.

    # ---- backtrace -------------------------------------------------------- #
    # Walk frames from S-1 down to 1; at padded frames hold position at the
    # row's end token until the last valid frame is reached.
    end_token = jnp.maximum(t_len - 1, 0)  # (B,)

    def backward(t_cur, inputs):
        s, choice_s = inputs  # scalar frame index (1-based), (B, T)
        active = s <= (s_len - 1)  # frame s is a real frame
        at_last = s == (s_len - 1)
        t_here = jnp.where(at_last, end_token, t_cur)
        take_diag = jnp.take_along_axis(choice_s, t_here[:, None], axis=-1)[:, 0]
        t_prev = jnp.where(active, t_here - take_diag.astype(jnp.int32), t_here)
        return t_prev, t_here

    frames_desc = jnp.arange(S - 1, 0, -1)
    choices_desc = choices[::-1]
    t_final, path_desc = jax.lax.scan(backward, end_token, (frames_desc, choices_desc))
    # path for frames S-1..1 (descending), then frame 0 = t_final
    path = jnp.concatenate([t_final[None, :], path_desc[::-1]], axis=0)  # (S, B)
    path = jnp.moveaxis(path, 0, 1)  # (B, S)

    attn = jax.nn.one_hot(path, T, dtype=log_likelihood.dtype)
    attn = attn * frame_mask[..., None] * token_mask[:, None, :]
    return attn


def prior_log_likelihood(
    latents: jax.Array,  # (B, S, C) z_p (flow-forward of posterior sample)
    prior_means: jax.Array,  # (B, T, C)
    prior_log_stddev: jax.Array,  # (B, T, C)
) -> jax.Array:
    """log N(z_p[s] ; mu[t], sigma[t]) summed over channels -> (B, S, T).

    Expanded into four MXU matmuls like the original VITS "neg_cent" trick so
    no (B, S, T, C) intermediate is materialized.
    """
    const = -0.5 * jnp.log(2 * jnp.pi)
    inv_var = jnp.exp(-2.0 * prior_log_stddev)  # (B, T, C)
    term1 = jnp.sum(const - prior_log_stddev - 0.5 * inv_var * prior_means**2, axis=-1)
    term2 = jnp.einsum("bsc,btc->bst", latents, inv_var * prior_means)
    term3 = jnp.einsum("bsc,btc->bst", -0.5 * latents**2, inv_var)
    return term1[:, None, :] + term2 + term3
