"""HiFiGAN-style discriminators for adversarial VITS training.

Multi-period discriminators (periods 2/3/5/7/11: audio folded to 2-D and
convolved along time-within-period) plus one multi-scale discriminator on the
raw waveform — the VITS training ensemble.  No counterpart exists in the
reference (inference-only) or in HF transformers (training unsupported), so
the architecture follows the original VITS/HiFiGAN design and parameters are
initialized here (kaiming-normal like torch Conv defaults).

All convs run in NTC/NHWC so channels ride the TPU lane axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.ops.conv import conv1d, leaky_relu

PERIODS = (2, 3, 5, 7, 11)
_SLOPE = 0.1

# (out_channels, kernel, stride) for the period discriminators' conv ladder.
_MPD_LADDER = ((32, 5, 3), (128, 5, 3), (512, 5, 3), (1024, 5, 3), (1024, 5, 1))
# (out_channels, kernel, stride, groups) for the scale discriminator.
_MSD_LADDER = (
    (16, 15, 1, 1),
    (64, 41, 4, 4),
    (256, 41, 4, 16),
    (1024, 41, 4, 64),
    (1024, 41, 4, 256),
    (1024, 5, 1, 1),
)


def _kaiming(rng: np.random.Generator, shape, fan_in):
    std = math.sqrt(2.0 / fan_in)
    return (rng.standard_normal(shape) * std).astype(np.float32)


def init_discriminator_params(seed: int = 0) -> dict:
    """Flat param dict (canonical layouts: conv1d (k,in/g,out), conv2d (kh,kw,in,out))."""
    rng = np.random.default_rng(seed)
    params: dict[str, np.ndarray] = {}

    for p_idx, _period in enumerate(PERIODS):
        in_ch = 1
        for i, (out_ch, k, _s) in enumerate(_MPD_LADDER):
            name = f"discriminator.mpd.{p_idx}.convs.{i}"
            params[f"{name}.weight"] = _kaiming(rng, (k, 1, in_ch, out_ch), k * in_ch)
            params[f"{name}.bias"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
        name = f"discriminator.mpd.{p_idx}.conv_post"
        params[f"{name}.weight"] = _kaiming(rng, (3, 1, in_ch, 1), 3 * in_ch)
        params[f"{name}.bias"] = np.zeros(1, np.float32)

    in_ch = 1
    for i, (out_ch, k, _s, g) in enumerate(_MSD_LADDER):
        name = f"discriminator.msd.convs.{i}"
        params[f"{name}.weight"] = _kaiming(rng, (k, in_ch // g, out_ch), k * in_ch // g)
        params[f"{name}.bias"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    params["discriminator.msd.conv_post.weight"] = _kaiming(rng, (3, in_ch, 1), 3 * in_ch)
    params["discriminator.msd.conv_post.bias"] = np.zeros(1, np.float32)
    return params


def _conv2d(x, kernel, bias, stride, padding):
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


def _period_discriminator(params: dict, prefix: str, audio: jax.Array, period: int):
    """audio: (B, T) -> (logits, feature list). Folds T into (T/period, period)."""
    B, T = audio.shape
    pad = (-T) % period
    if pad:
        # reflect-pad like HiFiGAN's DiscriminatorP
        audio = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
    x = audio.reshape(B, -1, period, 1)  # (B, T/p, p, 1) NHWC

    feats = []
    for i, (_out, k, s) in enumerate(_MPD_LADDER):
        name = f"{prefix}.convs.{i}"
        x = _conv2d(
            x, params[f"{name}.weight"], params[f"{name}.bias"],
            stride=(s, 1), padding=(((k - 1) // 2, (k - 1) // 2), (0, 0)),
        )
        x = leaky_relu(x, _SLOPE)
        feats.append(x)
    x = _conv2d(
        x, params[f"{prefix}.conv_post.weight"], params[f"{prefix}.conv_post.bias"],
        stride=(1, 1), padding=((1, 1), (0, 0)),
    )
    feats.append(x)
    return x.reshape(B, -1), feats


def _scale_discriminator(params: dict, prefix: str, audio: jax.Array):
    x = audio[..., None]  # (B, T, 1)
    feats = []
    for i, (_out, k, s, g) in enumerate(_MSD_LADDER):
        name = f"{prefix}.convs.{i}"
        x = conv1d(
            x, params[f"{name}.weight"], params[f"{name}.bias"],
            stride=s, padding=(k - 1) // 2, groups=g,
        )
        x = leaky_relu(x, _SLOPE)
        feats.append(x)
    x = conv1d(
        x, params[f"{prefix}.conv_post.weight"], params[f"{prefix}.conv_post.bias"],
        padding=1,
    )
    feats.append(x)
    return x.reshape(audio.shape[0], -1), feats


def discriminate(params: dict, audio: jax.Array):
    """audio: (B, T) -> (list of logits arrays, list of per-D feature lists)."""
    logits, feats = [], []
    for p_idx, period in enumerate(PERIODS):
        lg, ft = _period_discriminator(
            params, f"discriminator.mpd.{p_idx}", audio, period
        )
        logits.append(lg)
        feats.append(ft)
    lg, ft = _scale_discriminator(params, "discriminator.msd", audio)
    logits.append(lg)
    feats.append(ft)
    return logits, feats
