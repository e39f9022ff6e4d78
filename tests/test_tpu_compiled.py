"""Compiled-mode kernel checks on a REAL TPU backend.

The CI suite runs on CPU where Pallas kernels execute in interpret mode;
Mosaic compilation has its own failure modes (layout inference, block
rules) that only surface on hardware.  These tests skip unless the session
backend is a TPU — run them manually on a chip:

    VITS_TPU_TESTS=1 JAX_DEFAULT_MATMUL_PRECISION=highest \
        python -m pytest tests/test_tpu_compiled.py -q

They pin compiled-vs-interpret agreement at "highest" kernel precision
(fast-precision divergence on random saturated weights is documented in
BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU backend (CI runs CPU/interpret)",
)


def test_stage_chain_compiled_matches_interpret():
    from tests.test_pallas_stage import _make_stage, SLOPE
    from vits_tpu.ops.pallas.stage import fused_stage

    rng = np.random.default_rng(3)
    T_in = 256
    lengths = np.array([256, 101], np.int32)
    up_wA, up_bA, rbA = _make_stage(rng, 128, 64, 4, (3, 7, 11))
    up_wB, up_bB, rbB = _make_stage(rng, 64, 32, 4, (3, 7, 11))
    wpost = (rng.standard_normal((7, 32, 1)) * 0.2).astype(np.float32)
    x = rng.standard_normal((2, T_in, 128)).astype(np.float32)
    x = x * (np.arange(T_in)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    kw = dict(stride=2, up_padding=1, slope=SLOPE, precision="highest")

    def run(interp):
        a = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                        resblocks=rbA, lengths=jnp.asarray(lengths),
                        packed_out=True, interpret=interp, **kw)
        return np.asarray(fused_stage(
            a, jnp.asarray(up_wB), jnp.asarray(up_bB),
            resblocks=rbB, lengths=jnp.asarray(lengths) * 2,
            packed_in=T_in * 2, final_conv=(jnp.asarray(wpost), 3),
            interpret=interp, **kw))

    np.testing.assert_allclose(run(False), run(True), atol=1e-4)


def test_flash_attention_compiled_matches_interpret():
    from vits_tpu.ops.pallas.attention import flash_rel_attention

    rng = np.random.default_rng(0)
    B, H, L, d, w = 1, 2, 512, 96, 4
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.float32)
    q, k, v = mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d)
    rk, rv = mk(2 * w + 1, d), mk(2 * w + 1, d)
    lens = jnp.asarray([387], jnp.int32)
    kw = dict(window=w, lengths=lens, precision="highest")
    ref = np.asarray(flash_rel_attention(q, k, v, rk, rv, interpret=True, **kw))
    got = np.asarray(flash_rel_attention(q, k, v, rk, rv, **kw))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_engine_pallas_vs_xla_pinned_precision(tmp_path):
    """Full engine on the fixture: pallas attention path == XLA at pinned
    matmul precision (lengths equal, waveforms within int16 transfer noise)."""
    import os
    if os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") != "highest":
        pytest.skip("run with JAX_DEFAULT_MATMUL_PRECISION=highest")
    import vits_tpu
    from vits_tpu.config import EngineConfig

    fx = "tests/fixtures/tiny-vits.ggml"
    a = vits_tpu.load_model(fx, EngineConfig(
        token_buckets=(64,), use_pallas_vocoder=False,
        pallas_precision="highest"))
    b = vits_tpu.load_model(fx, EngineConfig(
        token_buckets=(64,), use_pallas_vocoder=False,
        use_pallas_attention=False))
    wa = a.synthesize("hello compiled kernels", seed=3)
    wb = b.synthesize("hello compiled kernels", seed=3)
    assert wa.shape == wb.shape
    np.testing.assert_allclose(wa, wb, atol=1e-4)
