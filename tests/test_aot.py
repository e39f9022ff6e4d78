"""AOT program bundles (io/aot.py): export, trace-free serve, guardrails."""

import json
import os

import numpy as np
import pytest

import vits_tpu
from vits_tpu.config import EngineConfig
from vits_tpu.io.aot import MANIFEST, AotBundle, export_bundle

FIXTURE = "tests/fixtures/tiny-vits.ggml"
ENGINE_KW = dict(
    token_buckets=(64,), frames_per_token=4.0, use_pallas_vocoder=False,
    use_pallas_attention=False, transfer_int16=False,
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """(bundle_dir, reference model) — programs for batch 1 and 2."""
    ref = vits_tpu.load_model(FIXTURE, EngineConfig(**ENGINE_KW))
    out = str(tmp_path_factory.mktemp("aot_bundle"))
    manifest = export_bundle(ref, out, batch_sizes=(1, 2))
    return out, ref, manifest


@pytest.fixture(scope="module")
def aot_model(bundle):
    out, _, _ = bundle
    return vits_tpu.load_model(
        FIXTURE, EngineConfig(**ENGINE_KW, aot_bundle_dir=out))


def test_manifest_contents(bundle):
    out, ref, manifest = bundle
    assert os.path.exists(os.path.join(out, MANIFEST))
    # 1 bucket x 2 batches x 2 rng layouts x 2 speaker variants
    assert len(manifest["programs"]) == 8
    for e in manifest["programs"]:
        assert os.path.exists(os.path.join(out, e["file"]))
        assert e["tokens"] == 64 and e["frames"] == ref._frame_capacity(64)


def test_aot_serve_bit_identical(bundle, aot_model):
    _, ref, _ = bundle
    wa = ref.synthesize("hello aot bundle", seed=4)
    wb = aot_model.synthesize("hello aot bundle", seed=4)
    np.testing.assert_array_equal(wa, wb)
    assert aot_model.stats["aot_hits"] >= 1
    assert aot_model.stats["redispatches"] == 0


def test_aot_batch_and_controls(bundle, aot_model):
    _, ref, _ = bundle
    hits0 = aot_model.stats["aot_hits"]
    got = aot_model.synthesize(["hello", "sad dame"], seed=[1, 2])
    want = ref.synthesize(["hello", "sad dame"], seed=[1, 2])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    g2 = aot_model.synthesize("hello", seed=1, speaking_rate=1.4)
    w2 = ref.synthesize("hello", seed=1, speaking_rate=1.4)
    np.testing.assert_array_equal(g2, w2)
    assert aot_model.stats["aot_hits"] == hits0 + 2
    assert aot_model.stats["aot_misses"] == 0


def test_unexported_signature_falls_back(bundle, aot_model):
    """batch=3 was not exported: dispatch falls back to jit, still correct."""
    _, ref, _ = bundle
    misses0 = aot_model.stats["aot_misses"]
    got = aot_model.synthesize(["a b", "c", "hello well"], seed=[1, 2, 3])
    want = ref.synthesize(["a b", "c", "hello well"], seed=[1, 2, 3])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert aot_model.stats["aot_misses"] == misses0 + 1


def test_engine_option_mismatch_rejected(bundle):
    out, _, _ = bundle
    with pytest.raises(ValueError, match="engine options differ"):
        vits_tpu.load_model(FIXTURE, EngineConfig(
            **{**ENGINE_KW, "transfer_int16": True}, aot_bundle_dir=out))


def test_model_mismatch_rejected(bundle, tmp_path):
    """A bundle refuses a different model architecture."""
    out, _, _ = bundle
    from vits_tpu.config import VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.random_init import random_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig(
        upsample_initial_channel=32,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    with pytest.raises(ValueError, match="different model"):
        Synthesizer(config, tok, random_params(config, seed=0),
                    EngineConfig(**ENGINE_KW, aot_bundle_dir=out))


def test_mesh_engine_export_raises():
    import jax

    from vits_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    model = vits_tpu.load_model(FIXTURE, EngineConfig(**ENGINE_KW), mesh=mesh)
    with pytest.raises(NotImplementedError, match="mesh"):
        export_bundle(model, "/tmp/nope")


def test_bundle_version_gate(bundle, tmp_path):
    out, _, _ = bundle
    with open(os.path.join(out, MANIFEST)) as f:
        manifest = json.load(f)
    manifest["version"] = 99
    bad = tmp_path / "bad_bundle"
    bad.mkdir()
    with open(bad / MANIFEST, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="version"):
        AotBundle(str(bad))


def test_cross_platform_tpu_export(bundle, tmp_path):
    """TPU programs (XLA path) export from a CPU host: the deploy-from-
    build-machine flow.  Deserialization succeeds; the platform is recorded
    so a CPU engine can't dispatch it (and vice versa)."""
    from jax import export as jexport

    _, ref, _ = bundle
    out = str(tmp_path / "tpu_bundle")
    manifest = export_bundle(ref, out, batch_sizes=(1,),
                             per_row_seeds=(False,), with_speaker=False,
                             platforms=("tpu",))
    assert all(e["platforms"] == ["tpu"] for e in manifest["programs"])
    prog = manifest["programs"][0]["file"]
    with open(os.path.join(out, prog), "rb") as f:
        exp = jexport.deserialize(f.read())
    assert exp.platforms == ("tpu",)
