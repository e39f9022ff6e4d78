"""Fused whole-flow kernel (ops/pallas/flow.py) vs the XLA module math.

Interpret-mode equivalence of the single-kernel residual-coupling stack
against models/flow.py::residual_coupling_block(reverse=True) — the exact
path latents_from_prior runs — including per-row length masking, batching,
and the multi-speaker conditioning fold.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.io.random_init import random_params
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.ops.pallas.flow import fused_flow, pack_flow_cond, pack_flow_weights


def small_config(**kw):
    return dataclasses.replace(
        VitsConfig(),
        hidden_size=32,
        flow_size=16,
        prior_encoder_num_flows=4,
        prior_encoder_num_wavenet_layers=2,
        **kw,
    )


def run_both(config, B, T, lengths=None, speaker=None, seed=0):
    rng = np.random.default_rng(seed)
    params = random_params(config, seed=seed, keep_training=False)
    p = ParamView(params)
    x = jnp.asarray(rng.standard_normal((B, T, config.flow_size)), jnp.float32)

    if lengths is None:
        mask = jnp.ones((B, T, 1), jnp.float32)
        lens = None
    else:
        lens = jnp.asarray(lengths, jnp.int32)
        mask = (jnp.arange(T)[None, :, None] < lens[:, None, None]).astype(jnp.float32)
        x = x * mask

    cond_emb = None
    if speaker is not None:
        cond_emb = jnp.asarray(
            rng.standard_normal((B, 1, config.speaker_embedding_size)), jnp.float32)

    ref, _ = residual_coupling_block(p, config, x, mask, cond_emb, reverse=True)
    ref = np.asarray(ref * mask)

    packed, type_a = pack_flow_weights(p, config)
    cond = pack_flow_cond(p, config, cond_emb) if cond_emb is not None else None
    got = np.asarray(fused_flow(
        x, packed, type_a, config, lengths=lens, cond=cond,
        interpret=True, precision="highest",
    ))
    if lengths is not None:
        got = got * np.asarray(mask)
    return ref, got


def test_fused_flow_matches_module():
    config = small_config()
    ref, got = run_both(config, B=1, T=40)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_fused_flow_batched_masked():
    config = small_config()
    ref, got = run_both(config, B=3, T=48, lengths=[48, 17, 33])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_fused_flow_multispeaker_cond():
    config = small_config(num_speakers=4, speaker_embedding_size=8)
    ref, got = run_both(config, B=2, T=24, lengths=[24, 11], speaker=True)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_fused_flow_mms_shape():
    """Full MMS dims (192 hidden / 4x4 layers) at a short T."""
    config = VitsConfig()
    ref, got = run_both(config, B=1, T=24, lengths=[20])
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_fused_flow_negative_control():
    """Masking actually matters: mismatched lengths must NOT agree."""
    config = small_config()
    ref, _ = run_both(config, B=1, T=40)
    _, got_short = run_both(config, B=1, T=40, lengths=[23])
    assert not np.allclose(ref, got_short, atol=1e-3)
