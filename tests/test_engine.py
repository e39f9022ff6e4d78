"""Synthesizer engine tests: bucketing, jit caching, overflow re-dispatch, WAV."""

import io

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.synthesizer import Synthesizer, _next_bucket
from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.utils.wav import pcm16, read_wav, write_wav

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def engine_model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32, 64), frames_per_token=2.0)
    return Synthesizer(config, tok, params, eng)


def test_next_bucket():
    assert _next_bucket((64, 128, 256), 1) == 64
    assert _next_bucket((64, 128, 256), 64) == 64
    assert _next_bucket((64, 128, 256), 65) == 128
    assert _next_bucket((64, 128, 256), 300) == 512  # beyond largest: rounds up


def test_synthesize_single(engine_model):
    wave = engine_model.synthesize("hello sad dame", seed=0)
    assert wave.ndim == 1 and wave.dtype == np.float32
    assert len(wave) > 0 and np.isfinite(wave).all()
    assert np.abs(wave).max() <= 1.0


def test_synthesize_deterministic_per_seed(engine_model):
    a = engine_model.synthesize("hello sad dame", seed=7)
    b = engine_model.synthesize("hello sad dame", seed=7)
    c = engine_model.synthesize("hello sad dame", seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_synthesize_batch_lengths(engine_model):
    waves = engine_model.synthesize(["hello sad dame", "ab"], seed=0)
    assert isinstance(waves, list) and len(waves) == 2
    assert len(waves[0]) != len(waves[1])


def test_batch_rows_draw_independent_noise(engine_model):
    """Identical texts in one batch must get independent noise draws
    (each row is its own utterance, not a copy)."""
    waves_batch = engine_model.synthesize(["hello", "hello"], seed=3)
    assert not np.array_equal(waves_batch[0], waves_batch[1])


def test_overflow_redispatch(tiny_bundle):
    """A tiny frame budget must escalate until the utterance fits."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,), frames_per_token=0.125)  # absurdly small
    model = Synthesizer(config, tok, params, eng)
    out = model.synthesize_raw("hello sad dame", seed=0, max_redispatch=8)
    predicted = int(np.asarray(out.frame_lengths)[0])
    capacity = np.asarray(out.waveform).shape[1] // config.total_upsample
    assert capacity >= predicted  # escalation reached a fitting bucket


def test_matmul_precision_knob_cpu_noop(tiny_bundle):
    """EngineConfig.matmul_precision traces under jax.default_matmul_precision.
    On CPU every tier is fp32, so the knob must be output-identical to the
    default — this pins the plumbing (no crash, no behavior change where none
    is expected); the TPU behavior test lives in test_tpu_compiled.py."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    base = Synthesizer(config, tok, params,
                       EngineConfig(token_buckets=(32,), frames_per_token=4.0))
    knob = Synthesizer(config, tok, params,
                       EngineConfig(token_buckets=(32,), frames_per_token=4.0,
                                    matmul_precision="highest"))
    np.testing.assert_array_equal(
        base.synthesize("hello sad dame", seed=5),
        knob.synthesize("hello sad dame", seed=5))


def test_fidelity_tiers(tiny_bundle):
    """EngineConfig.fidelity_kwargs maps user tiers to the precision knobs;
    every tier constructs a working engine (CPU: all tiers are fp32, so the
    fast/exact outputs coincide — TPU separation is covered by the
    BENCH_DETAIL value_dtype_fidelity_trained table)."""
    kw = EngineConfig.fidelity_kwargs("exact")
    assert kw["pallas_precision"] == "highest"
    assert kw["matmul_precision"] == "highest"
    assert kw["pallas_value_dtype"] == "float32"
    kw = EngineConfig.fidelity_kwargs("high")
    assert kw["pallas_precision"] == "high"  # 3-pass bf16x3 kernel dots
    assert kw["pallas_value_dtype"] == "float32"
    assert EngineConfig.fidelity_kwargs("fast") == {}
    assert EngineConfig.fidelity_kwargs("glue32") == {
        "matmul_precision": "highest"}
    with pytest.raises(ValueError):
        EngineConfig.fidelity_kwargs("ultra")
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    waves = {}
    for tier in ("fast", "high", "exact"):
        model = Synthesizer(
            config, tok, params,
            EngineConfig(token_buckets=(32,), frames_per_token=4.0,
                         **EngineConfig.fidelity_kwargs(tier)))
        waves[tier] = model.synthesize("hello sad dame", seed=5)
    np.testing.assert_array_equal(waves["fast"], waves["exact"])
    np.testing.assert_array_equal(waves["fast"], waves["high"])


def test_warmup_overflow_ladder_precompiles_redispatch(tiny_bundle):
    """warmup(overflow_ladder=N) pre-compiles the redispatch rungs, so an
    overflowing request escalates into an ALREADY-compiled program — no XLA
    compile (20-40 s on TPU) charged to a live request."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,), frames_per_token=2.0,
                       adaptive_capacity=False)
    model = Synthesizer(config, tok, params, eng)
    model.warmup(batch_sizes=(1,), overflow_ladder=2)
    shapes = model.stats["compiled_shapes"]
    assert shapes == 3  # base capacity + two doubled rungs
    model.synthesize_raw("hello sad dame", seed=0)
    assert model.stats["redispatches"] > 0  # this fixture overflows 2.0 f/t...
    assert model.stats["compiled_shapes"] == shapes  # ...into warmed programs


def test_warmup_compiles_without_error(engine_model):
    """warmup() drives _dispatch directly; regression: it crashed on the raw
    output tuple after the single-device_get refactor (broke server startup)."""
    engine_model.warmup(batch_sizes=(1,), token_buckets=(32,))
    assert engine_model.stats["dispatches"] > 0


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal(1000) * 0.3, -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, audio, 16000)
    back, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(back, audio, atol=1.0 / 32000)


def test_pcm16_clamps():
    out = pcm16(np.array([-2.0, 0.0, 2.0], np.float32))
    assert out.tolist() == [-32767, 0, 32767]


# --------------------------------------------------------------------------- #
# Per-call synthesis controls (traced, no recompile) and per-row seeds
# --------------------------------------------------------------------------- #


def test_speaking_rate_scales_predicted_frames(engine_model):
    """speaking_rate=2 must roughly halve the predicted frame count
    (reference honors this only from config, vits.cpp:977-979)."""
    base = engine_model.synthesize_raw("hello sad dame", seed=0)
    fast = engine_model.synthesize_raw("hello sad dame", seed=0, speaking_rate=2.0)
    slow = engine_model.synthesize_raw("hello sad dame", seed=0, speaking_rate=0.5)
    f0 = int(base.frame_lengths[0])
    assert int(fast.frame_lengths[0]) < f0 < int(slow.frame_lengths[0])
    # ceil() per token makes the ratio inexact; bound it loosely
    assert 0.3 <= int(fast.frame_lengths[0]) / f0 <= 0.7


def test_controls_do_not_recompile(engine_model):
    """Control overrides are traced scalars — same compiled program."""
    engine_model.synthesize("hello sad dame", seed=0)
    shapes = engine_model.stats["compiled_shapes"]
    engine_model.synthesize(
        "hello sad dame", seed=0,
        noise_scale=0.21, noise_scale_duration=0.43, speaking_rate=1.17,
    )
    assert engine_model.stats["compiled_shapes"] == shapes


def test_zero_noise_scales_are_seed_invariant(engine_model):
    """With both noise scales at 0 the pipeline is deterministic, so
    different seeds must give identical audio (proves the knobs reach the
    sampling sites, not just the signature)."""
    a = engine_model.synthesize(
        "hello sad dame", seed=1, noise_scale=0.0, noise_scale_duration=0.0
    )
    b = engine_model.synthesize(
        "hello sad dame", seed=2, noise_scale=0.0, noise_scale_duration=0.0
    )
    np.testing.assert_array_equal(a, b)


def test_per_row_seeds_in_one_batch(engine_model):
    """A list of seeds gives per-row noise streams inside ONE dispatch:
    equal seeds -> identical rows, different seeds -> different rows."""
    dispatches_before = engine_model.stats["dispatches"]
    redispatches_before = engine_model.stats["redispatches"]
    waves = engine_model.synthesize(
        ["hello", "hello", "hello"], seed=[5, 5, 9]
    )
    extra = engine_model.stats["redispatches"] - redispatches_before
    assert engine_model.stats["dispatches"] == dispatches_before + 1 + extra
    np.testing.assert_array_equal(waves[0], waves[1])
    assert not np.array_equal(waves[0], waves[2])


def test_per_row_seed_list_deterministic(engine_model):
    a = engine_model.synthesize(["hello sad dame"], seed=[11])[0]
    b = engine_model.synthesize(["hello sad dame"], seed=[11])[0]
    np.testing.assert_array_equal(a, b)


def test_submit_collect_pipelined_matches_sequential(engine_model):
    """Async submit/collect with 2 in-flight must produce the same audio as
    the synchronous path (dispatch is async; only collect blocks)."""
    texts = ["hello sad dame", "ab well", "mad dash home", "sles awes"]
    seq = [engine_model.synthesize(t, seed=9) for t in texts]

    from collections import deque

    pending = deque()
    piped = []
    for t in texts:
        pending.append(engine_model.submit(t, seed=9))
        if len(pending) >= 2:
            piped.append(engine_model.collect(pending.popleft()))
    while pending:
        piped.append(engine_model.collect(pending.popleft()))

    for a, out in zip(seq, piped):
        b = out.waveform[0, : out.lengths[0]]
        np.testing.assert_array_equal(a, b)


def test_default_operating_point_no_repeat_redispatch(tiny_bundle):
    """The DEFAULT EngineConfig must not keep tripping the overflow ladder.

    Round 2 measured MMS-shaped weights predicting ~2.2 frames/token while
    the default capacity was 2.0 — every default-config user paid the
    re-dispatch penalty on EVERY utterance while the benches quietly
    overrode 2.5.  The default is now the measured point (2.5, bench.py rides
    it unmodified) AND the engine adapts: an overflow raises the working
    frames/token, so any checkpoint pays the ladder at most once per rate
    regime — this tiny fixture predicts >2.5 frames/token, exercising exactly
    that path."""
    config, params = tiny_bundle
    assert EngineConfig().frames_per_token == 2.5  # bench.py relies on this
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32, 64)))
    texts = ("hello sad dame", "a much much longer sentence with many words he said")
    for text in texts:
        model.synthesize(text, seed=0)
    settled = model.stats["redispatches"]
    for text in texts:  # same traffic again: capacity has adapted
        model.synthesize(text, seed=0)
    assert model.stats["redispatches"] == settled


def test_adaptive_capacity_off_still_ladders(tiny_bundle):
    """adaptive_capacity=False preserves the pure-ladder behavior."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,), frames_per_token=0.125,
                       adaptive_capacity=False)
    model = Synthesizer(config, tok, params, eng)
    model.synthesize("hello sad dame", seed=0)
    assert model.stats["redispatches"] > 0
    assert model._frames_per_token == 0.125  # untouched
    model.synthesize("hello sad dame", seed=0)
    assert model.stats["redispatches"] >= 2  # ladders again every time


def test_compilation_cache_persists_programs(tiny_bundle, tmp_path):
    """EngineConfig.compilation_cache_dir writes compiled bucket programs to
    disk (the serving cold-start story: a restarted process reloads them
    instead of recompiling).  In-process we can observe the cache files and
    that a second engine built against the same dir still synthesizes.

    The engine sets the cache via PROCESS-GLOBAL jax.config (correct for a
    serving process, documented on EngineConfig) — restore it afterwards, or
    every later test in this process writes cache entries into this test's
    tmp_path; a full-suite run crashed with SIGABRT inside
    compilation_cache.put_executable_and_time ~100 tests later with the
    leaked setting (round-3 continuation).  Restoring the config flags is
    NOT enough: jax caches the initialized cache OBJECT module-globally and
    `_get_cache` keeps returning it after the dir is set back to None, so
    later compiles still attempt cache writes — serializing a shard_map CPU
    executable for such a write SIGSEGVed test_sp a full-suite run later
    (round-4).  reset_cache() clears the object."""
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        config, params = tiny_bundle
        tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
        cache = tmp_path / "xla-cache"
        eng = EngineConfig(token_buckets=(32,), frames_per_token=4.0,
                           compilation_cache_dir=str(cache))
        model = Synthesizer(config, tok, params, eng)
        w1 = model.synthesize("hello sad dame", seed=0)
        entries = list(cache.rglob("*"))
        assert any(p.is_file() for p in entries), entries
        model2 = Synthesizer(config, tok, params, eng)
        w2 = model2.synthesize("hello sad dame", seed=0)
        np.testing.assert_array_equal(w1, w2)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_bytes)
        cc.reset_cache()  # drop the module-global cache OBJECT too


def test_pallas_engine_path_runs_on_cpu():
    """use_pallas_vocoder=True off-TPU auto-selects interpret mode
    (ops/pallas/__init__.py::resolve_interpret) instead of crashing inside
    pallas_call — the engine's TPU serving config is runnable anywhere."""
    import vits_tpu

    fx = "tests/fixtures/tiny-vits.ggml"
    eng = lambda **kw: EngineConfig(token_buckets=(16,), frames_per_token=2.0,
                                    transfer_int16=False, **kw)
    ref = vits_tpu.load_model(fx, eng()).synthesize("hello", seed=11)
    got = vits_tpu.load_model(fx, eng(
        use_pallas_vocoder=True, pallas_value_dtype="bfloat16",
    )).synthesize("hello", seed=11)
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    assert float(np.abs(got - ref).max()) < 0.05  # bf16-value rounding only


def test_adaptive_capacity_ignores_speaking_rate_overrides(tiny_bundle):
    """A slow-speaking-rate request overflows because of ITS control, not the
    checkpoint's intrinsic frames/token — it must pay the redispatch ladder
    itself, not poison the engine-global working ratio for all future
    requests.  And a genuine overflow can raise the ratio by at most 2x per
    observation (one pathological utterance can't jump it to 30)."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,), frames_per_token=2.0)
    model = Synthesizer(config, tok, params, eng)
    before = model._frames_per_token
    model.synthesize("hello sad dame", seed=0, speaking_rate=0.25)
    assert model.stats["redispatches"] > 0  # it did overflow...
    assert model._frames_per_token == before  # ...without adapting

    # default-rate overflow still adapts, but clamped to 2x per observation
    tiny = Synthesizer(config, tok, params,
                       EngineConfig(token_buckets=(32,), frames_per_token=0.5))
    tiny.synthesize("hello sad dame", seed=0)
    assert tiny._frames_per_token <= 1.0  # 2x clamp (true rate is ~4-5)
    assert tiny._frames_per_token > 0.5


def test_adaptive_capacity_float32_rate_and_caps(tiny_bundle):
    """The override guard must compare at float32 — a checkpoint
    speaking_rate of 0.9 is not exactly representable, and an exact compare
    would silently disable adaptation for it.  And two more guards: a
    noise_scale_duration override must not adapt (its durations say nothing
    about the checkpoint's intrinsic rate), and the ratio never exceeds
    adaptive_capacity_max."""
    import dataclasses

    config, params = tiny_bundle
    config09 = dataclasses.replace(config, speaking_rate=0.9)
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")

    m = Synthesizer(config09, tok, params,
                    EngineConfig(token_buckets=(32,), frames_per_token=0.5))
    m.synthesize("hello sad dame", seed=0)  # default controls, rate 0.9
    assert m._frames_per_token > 0.5  # f32 guard did NOT block adaptation

    m2 = Synthesizer(config, tok, params,
                     EngineConfig(token_buckets=(32,), frames_per_token=0.5))
    m2.synthesize("hello sad dame", seed=0, noise_scale_duration=7.0)
    assert m2.stats["redispatches"] > 0
    assert m2._frames_per_token == 0.5  # override never adapts

    m3 = Synthesizer(config, tok, params,
                     EngineConfig(token_buckets=(32,), frames_per_token=0.5,
                                  adaptive_capacity_max=0.75))
    m3.synthesize("hello sad dame", seed=0)
    assert m3._frames_per_token <= 0.75  # hard cap


def test_adaptive_capacity_decays_after_normal_traffic(tiny_bundle):
    """A one-off overflow must not tax the fleet forever (round-3 verdict
    weak #8): after a raise, a full window of default-control dispatches
    that needed less deflates the working ratio — and with it the actual
    dispatched frame capacity — back to what the window needed.  Control-
    override traffic must NOT vote the ratio down (excluded from the
    window), and a single overflow's raise honors the per-request ceiling
    (adaptive_capacity_request_max) on top of the 2x clamp."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(
        token_buckets=(32,), frames_per_token=2.0,
        adaptive_capacity_window=3, adaptive_capacity_request_max=16.0,
    )
    model = Synthesizer(config, tok, params, eng)
    # this fixture predicts ~4.7 frames/token on the long text: one overflow
    model.synthesize(
        "a much much longer sentence with many words he said", seed=0)
    raised = model._frames_per_token
    assert raised > 2.0
    cap_raised = model._frame_capacity(32)

    # "bbbb" needs only ~2.9 frames/token; 3 of them fill the window, deflate
    for i in range(3):
        model.synthesize("bbbb", seed=i)
    assert model._frames_per_token < raised
    deflated_ratio = model._frames_per_token
    assert model._frame_capacity(32) < cap_raised  # real capacity shrank

    # override traffic is excluded from the window in BOTH directions: after
    # a fresh raise, fast-speech requests never deflate the ratio
    model.synthesize(
        "a much much longer sentence with many words he said", seed=0)
    raised2 = model._frames_per_token
    assert raised2 > deflated_ratio
    for i in range(5):
        model.synthesize("bbbb", seed=i, speaking_rate=2.0)
    assert model._frames_per_token == raised2

    # per-request ceiling: one overflow raises by at most request_max
    m2 = Synthesizer(config, tok, params,
                     EngineConfig(token_buckets=(32,), frames_per_token=3.0,
                                  adaptive_capacity_request_max=0.5))
    m2.synthesize(
        "a much much longer sentence with many words he said", seed=0)
    assert m2._frames_per_token <= 3.5


def test_adaptive_capacity_align_stays_on_warmed_rungs(tiny_bundle):
    """adaptive_capacity_align: the compile-free serving mode (round-4
    verdict weak #1 — the committed SLO artifact's 11 s p95 was mid-run XLA
    compiles of adaptively-raised capacities).  Every capacity the engine
    ever dispatches must be base_capacity * 2^k — exactly the rung shapes
    warmup(overflow_ladder=N) pre-compiles — through raises AND decays,
    and regardless of step/request_max interplay (a request_max smaller
    than the base ratio would land OFF-rung in the default mode)."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(
        token_buckets=(32,), frames_per_token=2.0,
        adaptive_capacity_align=True,
        adaptive_capacity_window=3,
        # poison pills for the unaligned path: ignored under align
        adaptive_capacity_step=0.3, adaptive_capacity_request_max=0.7,
    )
    model = Synthesizer(config, tok, params, eng)
    base_cap = model._frame_capacity(32)
    rungs = {base_cap * (2 ** k) for k in range(4)}

    # overflow (fixture rate ~4.7 frames/token at base 2.0) -> raise
    model.synthesize(
        "a much much longer sentence with many words he said", seed=0)
    assert model._frames_per_token == 4.0  # base * 2, not base + request_max
    assert model._frame_capacity(32) in rungs

    # decay after a window of light traffic: still on a rung
    for i in range(3):
        model.synthesize("bbbb", seed=i)
    assert model._frame_capacity(32) in rungs
    # the light traffic needed ~2.9 f/t -> still the 2x rung, not base
    assert model._frames_per_token == 4.0

    # hard cap applies as the largest rung under it (never off-ladder)
    m2 = Synthesizer(config, tok, params, EngineConfig(
        token_buckets=(32,), frames_per_token=0.5,
        adaptive_capacity_align=True, adaptive_capacity_max=1.7))
    m2.synthesize("a much much longer sentence with many words he said", seed=0)
    m2.synthesize("a much much longer sentence with many words he said", seed=1)
    m2.synthesize("a much much longer sentence with many words he said", seed=2)
    assert m2._frames_per_token == 1.0  # rung 0.5*2; next rung 2.0 > cap 1.7
    assert m2._frame_capacity(32) == m2.engine.frame_bucket(32) * 2


# ------------------------- batch bucketing ---------------------------- #


@pytest.fixture(scope="module")
def bucketed_model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32, 64), frames_per_token=4.0,
                       batch_buckets=(1, 2, 4))
    return Synthesizer(config, tok, params, eng)


def test_batch_buckets_rows_match_unbucketed(tiny_bundle, bucketed_model):
    """Per-row-seed outputs are invariant to batch padding (rows 3 -> 4)."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    plain = Synthesizer(config, tok, params, EngineConfig(
        token_buckets=(32, 64), frames_per_token=4.0))
    texts = ["hello", "sad dame", "well cheese"]
    a = plain.synthesize(texts, seed=[1, 2, 3])
    b = bucketed_model.synthesize(texts, seed=[1, 2, 3])
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_batch_buckets_bound_compiled_shapes(bucketed_model):
    """Batches of 2, 3, 4 rows all ride the batch-4 bucket: no dispatch
    signature with a batch dimension outside the configured buckets."""
    texts = ["hello", "sad dame", "well cheese", "be well"]
    for n in (2, 3, 4):
        bucketed_model.synthesize(texts[:n], seed=list(range(n)))
    batch_dims = {sig[0] for sig in bucketed_model._dispatch_shapes}
    assert batch_dims <= {1, 2, 4}, batch_dims
    assert 3 not in batch_dims


def test_batch_buckets_scalar_seed_pad_invariant(bucketed_model):
    """Scalar seeds expand to per-row keys: each row's audio is independent
    of how many rows rode the dispatch (the mesh-mode noise contract)."""
    c2 = bucketed_model.synthesize(["hello", "sad dame"], seed=7)
    c3 = bucketed_model.synthesize(["hello", "sad dame", "well"], seed=7)
    np.testing.assert_array_equal(c2[0], c3[0])
    np.testing.assert_array_equal(c2[1], c3[1])


def test_batch_buckets_single_text_unchanged(tiny_bundle, bucketed_model):
    """Bucket 1 exists, so single-string synthesis keeps the scalar-key
    noise stream — identical to an unbucketed engine."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    plain = Synthesizer(config, tok, params, EngineConfig(
        token_buckets=(32, 64), frames_per_token=4.0))
    np.testing.assert_array_equal(
        plain.synthesize("hello sad dame", seed=5),
        bucketed_model.synthesize("hello sad dame", seed=5))
