"""Pipeline parallelism (parallel/pipeline.py): GPipe over the encoder stack.

The reference has no parallelism at all (SURVEY.md §2b, batch==1 asserted at
/root/reference/src/vits.cpp:303); these pin the TPU-native pp axis:

- the pipelined encoder is numerically the plain encoder (same per-layer
  math via the shared ``encoder_layer``), for stages == layers and
  stages < layers, with and without remat, microbatches >= stages;
- gradients flow through the ppermute schedule and equal the plain
  encoder's (restacked), staying physically sharded one stage per device;
- a full generator train step with the pp encoder matches the reference
  train step's loss and keeps stage params sharded after the update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.io.random_init import random_params
from vits_tpu.models.encoder import text_encoder
from vits_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pp_train_step,
    pipeline_text_encoder,
    stack_pipeline_params,
    unstack_pipeline_params,
)

MEL_KWARGS = {"n_fft": 256, "hop_length": 64, "n_mels": 20}


def _four_layer_config():
    return VitsConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2, ffn_dim=64,
        flow_size=16, spectrogram_bins=65, upsample_initial_channel=32,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3), (1, 3)),
        prior_encoder_num_flows=2, prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=2, duration_predictor_num_flows=2,
        duration_predictor_flow_bins=6, depth_separable_num_layers=2,
        duration_predictor_filter_channels=32,
    )


def _encoder_inputs(config, rng, B=8, T=12):
    ids = rng.integers(0, config.vocab_size, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)
    mask[1, 8:] = 0.0  # ragged rows: the mask path must survive pipelining
    mask[5, 5:] = 0.0
    return ids, mask, mask[..., None]


@pytest.mark.parametrize("stages,data,microbatches,remat", [
    (4, 1, 4, False),  # one layer per stage
    (2, 1, 4, False),  # two layers per stage, M > P
    (4, 1, 8, True),   # remat'd stage interiors
    (2, 4, 2, False),  # pp x dp: microbatch rows shard across 4 chips/stage
])
def test_pp_encoder_matches_plain(stages, data, microbatches, remat):
    config = _four_layer_config()
    params = {k: jnp.asarray(v)
              for k, v in random_params(config, seed=0, keep_training=True).items()}
    rng = np.random.default_rng(0)
    ids, mask, mask3 = _encoder_inputs(config, rng)

    ref = text_encoder(ParamView(params), config, ids, mask3, mask)
    mesh = make_pipe_mesh(stages, data=data)
    pp = stack_pipeline_params(params, config, num_stages=stages, mesh=mesh)
    got = pipeline_text_encoder(pp, config, ids, mask3, mask, mesh,
                                microbatches=microbatches, remat=remat)
    for a, b, name in zip(ref, got, ("hidden", "means", "logvar")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_pp_stack_roundtrip():
    config = _four_layer_config()
    params = random_params(config, seed=1, keep_training=True)
    pp = stack_pipeline_params(params, config, num_stages=2)
    back = unstack_pipeline_params(pp, config)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))


def test_pp_grads_match_and_stay_sharded():
    config = _four_layer_config()
    params = {k: jnp.asarray(v)
              for k, v in random_params(config, seed=0, keep_training=True).items()}
    rng = np.random.default_rng(2)
    ids, mask, mask3 = _encoder_inputs(config, rng)
    mesh = make_pipe_mesh(4)
    pp = stack_pipeline_params(params, config, num_stages=4, mesh=mesh)

    def loss_pp(prm):
        out = pipeline_text_encoder(prm, config, ids, mask3, mask, mesh,
                                    microbatches=4)
        return jnp.sum(jnp.abs(out.last_hidden_state))

    def loss_plain(prm):
        out = text_encoder(ParamView(prm), config, ids, mask3, mask)
        return jnp.sum(jnp.abs(out.last_hidden_state))

    g_pp = jax.jit(jax.grad(loss_pp))(pp)
    g_plain = stack_pipeline_params(
        jax.jit(jax.grad(loss_plain))(params), config, num_stages=4)

    key = "text_encoder.encoder.pipeline.attention.q_proj.weight"
    # one stage block per device — the gradient never left its stage's chip
    assert len(g_pp[key].sharding.device_set) == 4
    assert g_pp[key].addressable_shards[0].data.shape[0] == 1
    # tolerance covers fp32 reduction-order noise on O(100)-magnitude grads
    # (the loss is a whole-batch abs-sum); a schedule bug (wrong stage order,
    # dropped microbatch, mis-permuted cotangent) is an O(grad) mismatch.
    for k in g_plain:
        if k.startswith("text_encoder.encoder.pipeline."):
            np.testing.assert_allclose(
                np.asarray(g_pp[k]), np.asarray(g_plain[k]),
                atol=1e-3, rtol=1e-3, err_msg=k)


def test_ppdp_grads_match_plain():
    """pp x dp: stage-param grads must psum over the 'data' axis (the
    shard_map transpose inserts it) and equal the single-device grads."""
    config = _four_layer_config()
    params = {k: jnp.asarray(v)
              for k, v in random_params(config, seed=0, keep_training=True).items()}
    rng = np.random.default_rng(4)
    ids, mask, mask3 = _encoder_inputs(config, rng)
    mesh = make_pipe_mesh(2, data=4)
    pp = stack_pipeline_params(params, config, num_stages=2, mesh=mesh)

    def loss_pp(prm):
        out = pipeline_text_encoder(prm, config, ids, mask3, mask, mesh,
                                    microbatches=2)
        return jnp.sum(jnp.abs(out.last_hidden_state))

    def loss_plain(prm):
        out = text_encoder(ParamView(prm), config, ids, mask3, mask)
        return jnp.sum(jnp.abs(out.last_hidden_state))

    g_pp = jax.jit(jax.grad(loss_pp))(pp)
    g_plain = stack_pipeline_params(
        jax.jit(jax.grad(loss_plain))(params), config, num_stages=2)
    for k in g_plain:
        if k.startswith("text_encoder.encoder.pipeline."):
            np.testing.assert_allclose(
                np.asarray(g_pp[k]), np.asarray(g_plain[k]),
                atol=1e-3, rtol=1e-3, err_msg=k)


def test_pp_train_step_matches_reference(tiny_bundle):
    from vits_tpu.train.step import TrainBatch, make_train_step

    config, raw = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in raw.items()}
    rng = np.random.default_rng(3)
    B, T, S = 4, 12, 24
    up = config.total_upsample
    batch = TrainBatch(
        input_ids=rng.integers(0, config.vocab_size, (B, T)).astype(np.int32),
        token_mask=np.ones((B, T), np.float32),
        spectrogram=rng.standard_normal(
            (B, S, config.spectrogram_bins)).astype(np.float32),
        frame_mask=np.ones((B, S), np.float32),
        audio=(rng.standard_normal((B, S * up)) * 0.1).astype(np.float32),
    )
    key = jax.random.PRNGKey(0)
    opt = optax.adamw(2e-4)

    ref_step = make_train_step(config, opt, segment_frames=8,
                               mel_kwargs=MEL_KWARGS, donate=False)
    _, _, ref_metrics = ref_step(params, opt.init(params), batch, key)

    mesh = make_pipe_mesh(2)
    pp = stack_pipeline_params(params, config, num_stages=2, mesh=mesh)
    step = make_pp_train_step(config, opt, mesh, microbatches=2,
                              segment_frames=8, mel_kwargs=MEL_KWARGS,
                              remat=True)
    new_pp, _, metrics = step(pp, opt.init(pp), batch, key)

    # identical RNG folding + identical math -> the losses agree
    np.testing.assert_allclose(float(metrics.loss), float(ref_metrics.loss),
                               rtol=1e-4)
    k = "text_encoder.encoder.pipeline.attention.q_proj.weight"
    assert "pipe" in str(new_pp[k].sharding.spec)
    assert not np.allclose(np.asarray(new_pp[k]), np.asarray(pp[k]))
