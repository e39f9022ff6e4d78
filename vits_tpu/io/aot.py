"""AOT program bundles: serialized serving artifacts via jax.export.

The engine compiles one XLA program per dispatch signature (batch x token
bucket x rng layout x speaker presence).  A *bundle* captures those programs
as versioned StableHLO artifacts on disk so a serving process can dispatch
without re-tracing the model code:

    model = vits_tpu.load_model("vits-eng.ggml")
    from vits_tpu.io.aot import export_bundle
    export_bundle(model, "bundle/")                      # once, offline
    ...
    model = vits_tpu.load_model(
        "vits-eng.ggml", EngineConfig(aot_bundle_dir="bundle/"))
    model.synthesize("hello")        # dispatches the exported program

What this buys over the persistent compilation cache
(EngineConfig.compilation_cache_dir — use both together):

  * the served program is a named, auditable artifact (deploy what you
    tested, byte-for-byte), stable across jax version upgrades within
    jax.export's compatibility window — the compilation cache invalidates
    on any library change;
  * zero tracing at startup (the cache only skips XLA compilation);
  * cross-host export: ``platforms=["tpu"]`` lowers TPU programs (including
    the Mosaic kernels) from a CPU-only build machine.

The reference has no counterpart: its "program" is rebuilt per utterance
(/root/reference/src/vits.cpp:1101-1164).  This is the TPU-native analogue
of shipping a compiled model artifact.

Weights are NOT in the bundle — they keep coming from the checkpoint, and a
model/engine fingerprint recorded at export is verified at load so a bundle
cannot silently serve a different model or engine configuration.

v1 limits: single-chip programs only (mesh engines raise), and signatures
not exported fall back to normal jit tracing (counted in
``stats["aot_misses"]``).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST = "manifest.json"
_VERSION = 1


def resolved_program_options(synth) -> dict:
    """The engine options that select a different XLA program, with
    None-means-auto fields resolved the same way Synthesizer._compiled
    resolves them on this backend."""
    eng = synth.engine
    use_pallas = eng.use_pallas_vocoder
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    use_attn = eng.use_pallas_attention
    if use_attn is None:
        use_attn = jax.default_backend() == "tpu"
    return {
        "use_pallas_vocoder": bool(use_pallas),
        "use_pallas_attention": bool(use_attn),
        "use_pallas_flow": bool(eng.use_pallas_flow),
        "pallas_precision": eng.pallas_precision,
        "pallas_value_dtype": synth._pallas_value_dtype,
        "compute_dtype": eng.compute_dtype,
        "transfer_int16": bool(eng.transfer_int16),
    }


def model_fingerprint(synth) -> str:
    """Hash of the model architecture + parameter tree (names/shapes/dtypes,
    packed-kernel weights included) — NOT the weight values: the bundle pairs
    with any checkpoint of the same architecture, matching how the engine's
    program depends on shapes only."""
    h = hashlib.sha256()
    h.update(repr(synth.config).encode())
    for name in sorted(synth.params):
        p = synth.params[name]
        h.update(f"{name}:{tuple(p.shape)}:{p.dtype}".encode())
    return h.hexdigest()[:32]


def _prog_filename(batch: int, tokens: int, frames: int,
                   rng_rows: bool, speaker: bool) -> str:
    return (f"prog_b{batch}_t{tokens}_f{frames}"
            f"_{'rowkeys' if rng_rows else 'onekey'}"
            f"_{'spk' if speaker else 'nospk'}.jexp")


def export_bundle(
    synth,
    out_dir: str,
    *,
    batch_sizes: Sequence[int] = (1,),
    token_buckets: Optional[Sequence[int]] = None,
    per_row_seeds: Sequence[bool] = (False, True),
    with_speaker: Optional[bool] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export the synthesizer's dispatch programs to ``out_dir``.

    One program per (batch, token bucket, rng layout, speaker presence).
    ``platforms`` follows jax.export (default: the current backend);
    ``["tpu"]`` cross-lowers from a CPU host — pin the pallas/attention
    engine options explicitly in that case, since auto-resolution follows
    the *export-time* backend and is fingerprint-checked at load.
    Returns the manifest dict.
    """
    if synth.mesh is not None:
        raise NotImplementedError(
            "AOT bundles cover single-chip programs; the mesh engine's "
            "shard_map dispatch is not exportable yet")
    from jax import export as jexport

    token_buckets = tuple(token_buckets or synth.engine.token_buckets)
    os.makedirs(out_dir, exist_ok=True)
    param_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), synth.params)
    controls_avals = tuple(
        jax.ShapeDtypeStruct((), jnp.float32) for _ in range(3))
    speaker_variants = (
        (False, True) if with_speaker is None
        else ((True,) if with_speaker else (False,))
    )

    entries = []
    for tokens in token_buckets:
        frames = synth._frame_capacity(tokens)
        fn = synth._compiled(frames)
        for batch in batch_sizes:
            ids = jax.ShapeDtypeStruct((batch, tokens), jnp.int32)
            mask = jax.ShapeDtypeStruct((batch, tokens), synth.compute_dtype)
            for rng_rows in per_row_seeds:
                rng = jax.ShapeDtypeStruct(
                    (batch, 2) if rng_rows else (2,), jnp.uint32)
                for speaker in speaker_variants:
                    spk = (jax.ShapeDtypeStruct((batch,), jnp.int32)
                           if speaker else None)
                    exp = jexport.export(
                        fn, platforms=list(platforms) if platforms else None,
                    )(param_avals, ids, mask, rng, spk, controls_avals)
                    fname = _prog_filename(batch, tokens, frames,
                                           rng_rows, speaker)
                    with open(os.path.join(out_dir, fname), "wb") as f:
                        f.write(exp.serialize())
                    entries.append({
                        "file": fname, "batch": batch, "tokens": tokens,
                        "frames": frames, "rng_rows": rng_rows,
                        "speaker": speaker,
                        "platforms": list(exp.platforms),
                    })

    manifest = {
        "version": _VERSION,
        "jax_version": jax.__version__,
        "fingerprint": model_fingerprint(synth),
        "options": resolved_program_options(synth),
        "frames_per_token": synth._frames_per_token,
        "programs": entries,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class AotBundle:
    """Loaded bundle: signature -> ready-to-dispatch compiled callable."""

    def __init__(self, bundle_dir: str):
        self.dir = bundle_dir
        with open(os.path.join(bundle_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("version") != _VERSION:
            raise ValueError(
                f"AOT bundle version {self.manifest.get('version')} != "
                f"supported {_VERSION}")
        self._index = {
            (e["batch"], e["tokens"], e["frames"],
             bool(e["rng_rows"]), bool(e["speaker"])): e["file"]
            for e in self.manifest["programs"]
        }
        self._compiled: dict = {}

    @property
    def frames_per_token(self) -> float:
        return float(self.manifest["frames_per_token"])

    def verify(self, synth) -> None:
        """Refuse to serve a bundle exported for a different model or
        program-selecting engine options (silent mismatch would dispatch a
        stale program on fresh weights)."""
        fp = model_fingerprint(synth)
        if fp != self.manifest["fingerprint"]:
            raise ValueError(
                f"AOT bundle {self.dir} was exported for a different model "
                f"(fingerprint {self.manifest['fingerprint']} != {fp})")
        opts = resolved_program_options(synth)
        if opts != self.manifest["options"]:
            diff = {
                k: (self.manifest["options"].get(k), opts[k])
                for k in set(opts) | set(self.manifest["options"])
                if self.manifest["options"].get(k) != opts.get(k)
            }
            raise ValueError(
                f"AOT bundle {self.dir} engine options differ "
                f"(bundle vs engine): {diff}")

    def lookup(self, batch: int, tokens: int, frames: int,
               rng_rows: bool, speaker: bool):
        """Compiled callable for the signature, or None when not exported."""
        key = (batch, tokens, frames, rng_rows, speaker)
        fname = self._index.get(key)
        if fname is None:
            return None
        fn = self._compiled.get(key)
        if fn is None:
            from jax import export as jexport

            with open(os.path.join(self.dir, fname), "rb") as f:
                exp = jexport.deserialize(f.read())
            fn = jax.jit(exp.call)
            self._compiled[key] = fn
        return fn
