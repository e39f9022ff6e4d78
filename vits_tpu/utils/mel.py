"""Spectrogram utilities: linear STFT magnitude and mel filterbanks.

Used for (a) the mel-L1 parity metric the project is judged on (BASELINE.md),
(b) the posterior-encoder input during training (linear spectrogram with
``spectrogram_bins`` = n_fft//2 + 1), and (c) the training mel-reconstruction
loss.  Implemented on jnp so it can live inside jitted training steps; the
Slaney-style mel filterbank matches librosa's default construction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


def stft_magnitude(
    audio: jax.Array,  # (B, T)
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
) -> jax.Array:
    """|STFT| -> (B, frames, n_fft//2 + 1)."""
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    num_frames = 1 + (audio.shape[-1] - n_fft) // hop_length
    idx = (
        jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )  # (frames, n_fft)
    frames = audio[:, idx] * window  # (B, frames, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = 1024,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_fft//2+1, n_mels)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs_mel = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_fft // 2 + 1)

    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(freqs_mel)
    ramps = freqs_mel[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs_mel[2 : n_mels + 2] - freqs_mel[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (bins, n_mels)


def log_mel_spectrogram(
    audio: jax.Array,  # (B, T)
    n_mels: int = 80,
    n_fft: int = 1024,
    hop_length: int = 256,
    sample_rate: int = 16000,
) -> jax.Array:
    mag = stft_magnitude(audio, n_fft=n_fft, hop_length=hop_length, win_length=n_fft)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = mag @ fb
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_l1(a: jax.Array, b: jax.Array, **kwargs) -> jax.Array:
    """Mean absolute log-mel distance between two batches of waveforms."""
    n = min(a.shape[-1], b.shape[-1])
    ma = log_mel_spectrogram(a[..., :n], **kwargs)
    mb = log_mel_spectrogram(b[..., :n], **kwargs)
    return jnp.mean(jnp.abs(ma - mb))
