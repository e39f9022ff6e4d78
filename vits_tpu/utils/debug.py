"""Debug & verification toolkit.

TPU-native rebuild of the reference's debug machinery:
  * stage-boundary activation capture — the exact tensors the reference
    golden-checks (text_encoder/prior stats/log_duration/latents/waveform,
    vits.cpp:1170-1176) — with save/load/compare in the style of
    SAVE_LAYER + scripts/verify_layers.py (allclose, default atol 1e-3)
  * shape assertions (ASSERT_SHAPE, debug.h:39-61) with wildcard dims
  * golden-prefix assertion (ASSERT_STARTS_WITH, debug.h:63-75)
  * wall-clock stage timing and an xprof trace context
    (the reference's per-graph ms logging, vits.cpp:1117-1125)
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator, Optional

import jax
import numpy as np

from vits_tpu.config import VitsConfig
from vits_tpu.models.vits import NoiseOverride, synthesize


def stage_outputs(
    params: dict,
    config: VitsConfig,
    input_ids,
    input_mask,
    num_frames: int,
    rng=None,
    noise: Optional[NoiseOverride] = None,
    speaker_id=None,
) -> dict[str, np.ndarray]:
    """Run synthesis and return every reference-checked stage tensor."""
    from vits_tpu.io.params import ParamView
    from vits_tpu.models.encoder import text_encoder

    enc = text_encoder(
        ParamView(params), config, np.asarray(input_ids),
        np.asarray(input_mask)[..., None], np.asarray(input_mask),
    )
    out = synthesize(
        params, config, input_ids, input_mask, num_frames,
        rng=rng, noise=noise, speaker_id=speaker_id,
    )
    return {
        "text_encoder_output": np.asarray(enc.last_hidden_state),
        "prior_means": np.asarray(enc.prior_means),
        "prior_log_variances": np.asarray(enc.prior_log_variances),
        "log_duration": np.asarray(out.log_duration),
        "latents": np.asarray(out.latents),
        "waveform": np.asarray(out.waveform),
        "lengths": np.asarray(out.lengths),
    }


def save_stages(directory: str, stages: dict[str, np.ndarray]) -> None:
    """SAVE_LAYER equivalent: one .npy per stage + a shape manifest."""
    os.makedirs(directory, exist_ok=True)
    manifest = {}
    for name, arr in stages.items():
        np.save(os.path.join(directory, f"{name}.npy"), arr)
        manifest[name] = list(arr.shape)
    with open(os.path.join(directory, "shapes.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_stages(directory: str) -> dict[str, np.ndarray]:
    out = {}
    for fname in sorted(os.listdir(directory)):
        if fname.endswith(".npy"):
            out[fname[:-4]] = np.load(os.path.join(directory, fname))
    return out


def compare_stages(
    got: dict[str, np.ndarray],
    expected: dict[str, np.ndarray],
    atol: float = 1e-3,
    names: Optional[list[str]] = None,
) -> dict[str, float]:
    """Max-abs-diff per stage; raises on mismatch beyond atol
    (verify_layers.py:25 behavior). Returns the diff report."""
    report = {}
    failures = []
    for name in names or sorted(set(got) & set(expected)):
        a, b = np.asarray(got[name]), np.asarray(expected[name])
        if a.shape != b.shape:
            failures.append(f"{name}: shape {a.shape} vs {b.shape}")
            continue
        diff = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))) if a.size else 0.0
        report[name] = diff
        if diff > atol:
            failures.append(f"{name}: max|diff|={diff:.3e} > atol={atol}")
    if failures:
        raise AssertionError("stage mismatch:\n  " + "\n  ".join(failures))
    return report


def assert_shape(x, *expected, name: str = "tensor") -> None:
    """ASSERT_SHAPE with wildcards: assert_shape(x, 192, None, 1)."""
    shape = tuple(np.shape(x))
    if len(shape) != len(expected) or any(
        e is not None and e != s for e, s in zip(expected, shape)
    ):
        raise AssertionError(f"{name}: shape {shape} != expected {expected}")


def assert_starts_with(x, *prefix, atol: float = 1e-3, name: str = "tensor") -> None:
    """ASSERT_STARTS_WITH: first N flat values must match goldens."""
    flat = np.asarray(x).reshape(-1)[: len(prefix)]
    golden = np.asarray(prefix, dtype=np.float64)
    if not np.allclose(flat.astype(np.float64), golden, atol=atol):
        raise AssertionError(f"{name}: starts with {flat.tolist()} != {list(prefix)}")


@contextlib.contextmanager
def stage_timer(label: str, log=print) -> Iterator[None]:
    """Wall-clock a block (device work must be blocked on inside the block)."""
    t0 = time.perf_counter()
    yield
    log(f"[vits_tpu] {label}: {(time.perf_counter() - t0) * 1000:.2f} ms")


@contextlib.contextmanager
def xprof_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context — view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
