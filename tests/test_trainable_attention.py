"""Flash rel-attention backward kernel vs XLA autodiff (interpret mode).

The trainable attention (ops/pallas/attention_grad.py) must produce the
same gradients as ``jax.grad`` through the XLA module math for every input
(q, k, v, rel_k, rel_v) — including prefix-length key masking and lengths
shorter than the padded tile grid.  fp32 + highest precision: tolerance 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.ops.pallas.attention_grad import (
    make_trainable_attention,
    xla_rel_attention,
)


def _inputs(B, H, L, d, window, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return (mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d),
            mk(2 * window + 1, d), mk(2 * window + 1, d))


def _grads(B, H, L, d, window=4, lengths=None, seed=0, tile_q=16, tile_k=16):
    q, k, v, rk, rv = _inputs(B, H, L, d, window, seed)
    lens = None if lengths is None else jnp.asarray(lengths, jnp.int32)
    g0 = jnp.asarray(
        np.random.default_rng(seed + 1).standard_normal((B, H, L, d))
        .astype(np.float32))
    if lens is not None:
        # cotangents only flow from valid queries, as in the masked encoder
        keep = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.float32)
        g0 = g0 * keep[:, None, :, None]

    attn = make_trainable_attention(
        window=window, tile_q=tile_q, tile_k=tile_k, interpret=True,
        precision="highest")

    def loss_pallas(q, k, v, rk, rv):
        return jnp.sum(attn(q, k, v, rk, rv, lens) * g0)

    def loss_xla(q, k, v, rk, rv):
        return jnp.sum(xla_rel_attention(q, k, v, rk, rv, window, lens) * g0)

    with jax.default_matmul_precision("highest"):
        got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, rk, rv)
        want = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, rk, rv)
    return got, want, lens


def _assert_close(got, want, lens, L, atol=1e-5):
    names = ["dq", "dk", "dv", "drel_k", "drel_v"]
    for name, g, w in zip(names, got, want):
        g, w = np.asarray(g), np.asarray(w)
        if lens is not None and g.ndim == 4:
            # padded key/query rows beyond each row's length are unused by
            # the consumer; compare only the valid region
            for b in range(g.shape[0]):
                n = int(lens[b])
                np.testing.assert_allclose(
                    g[b, :, :n], w[b, :, :n], atol=atol, rtol=1e-4,
                    err_msg=name)
        else:
            np.testing.assert_allclose(g, w, atol=atol, rtol=1e-4,
                                       err_msg=name)


def test_grads_match_single_tile():
    got, want, lens = _grads(1, 2, 16, 8)
    _assert_close(got, want, lens, 16)


def test_grads_match_multi_tile():
    got, want, lens = _grads(2, 2, 48, 8)
    _assert_close(got, want, lens, 48)


def test_grads_match_masked():
    got, want, lens = _grads(2, 2, 32, 8, lengths=[20, 32])
    _assert_close(got, want, lens, 32)


def test_grads_match_ragged_padding():
    # L=40 pads to 48 under tile_q=16: padded-query and padded-key rows must
    # not contaminate the real gradients
    got, want, lens = _grads(2, 2, 40, 8, lengths=[40, 33])
    _assert_close(got, want, lens, 40)


def test_grads_mms_head_dim():
    got, want, lens = _grads(1, 2, 24, 96, window=4, tile_q=8, tile_k=8)
    # d=96 dot reductions accumulate a little more fp32 rounding
    _assert_close(got, want, lens, 24, atol=3e-5)


def test_forward_value_unchanged():
    q, k, v, rk, rv = _inputs(1, 2, 32, 8, 4)
    attn = make_trainable_attention(window=4, tile_q=16, tile_k=16,
                                    interpret=True, precision="highest")
    got = np.asarray(attn(q, k, v, rk, rv, None))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(xla_rel_attention(q, k, v, rk, rv, 4, None))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_lse_output_matches_dense():
    from vits_tpu.ops.pallas.attention import flash_rel_attention

    q, k, v, rk, rv = _inputs(1, 2, 32, 8, 4)
    out, lse = flash_rel_attention(q, k, v, rk, rv, window=4, tile_q=16,
                                   tile_k=16, interpret=True,
                                   precision="highest", return_lse=True)
    # dense logsumexp of the same scores
    with jax.default_matmul_precision("highest"):
        from vits_tpu.ops.attention import (
            get_relative_embeddings,
            relative_position_to_absolute_position,
        )
        B, H, L, d = q.shape
        qf = q.reshape(B * H, L, d)
        s = jnp.einsum("bqd,bkd->bqk", qf, k.reshape(B * H, L, d))
        key_rel = get_relative_embeddings(rk[None], L, 4)
        s = s + relative_position_to_absolute_position(
            jnp.einsum("bqd,rd->bqr", qf, key_rel[0]))
        want = jax.nn.logsumexp(s, axis=-1).reshape(B, H, L)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_encoder_grads_match_xla(monkeypatch):
    """jax.grad through text_encoder(use_pallas=True, trainable=True) == XLA."""
    import dataclasses

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.params import ParamView
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.encoder import text_encoder
    import vits_tpu.ops.pallas.attention_grad as ag

    config = dataclasses.replace(
        VitsConfig(), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, ffn_dim=64, flow_size=16,
    )
    params = random_params(config, seed=3, keep_training=False)
    rng = np.random.default_rng(0)
    B, T = 2, 24
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (B, T)), jnp.int32)
    lens = jnp.asarray([24, 17], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    g0 = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    g0 = g0 * mask[..., None]

    orig = ag.make_trainable_attention.__wrapped__  # undo lru_cache

    def interp(**kw):
        kw["interpret"] = True
        kw["precision"] = "highest"
        return orig(**kw)

    monkeypatch.setattr(ag, "make_trainable_attention", interp)

    def loss(params, use_pallas):
        enc = text_encoder(ParamView(params), config, ids, mask[..., None],
                           mask, use_pallas=use_pallas, trainable=use_pallas)
        return jnp.sum(enc.prior_means * g0)

    with jax.default_matmul_precision("highest"):
        got = jax.grad(lambda p: loss(p, True))(params)
        want = jax.grad(lambda p: loss(p, False))(params)

    flat_g = jax.tree.leaves_with_path(got)
    flat_w = dict(jax.tree.leaves_with_path(want))
    checked = 0
    for path, g in flat_g:
        w = flat_w[path]
        g, w = np.asarray(g), np.asarray(w)
        if np.abs(w).max() == 0 and np.abs(g).max() == 0:
            continue
        np.testing.assert_allclose(g, w, atol=5e-5, rtol=1e-4,
                                   err_msg=str(path))
        checked += 1
    assert checked > 10  # attention projections, rel embeddings, ffn, norms
