"""Training checkpoint save/resume.

The reference's only "checkpoint" is the read-only .ggml model file — no
saving, no resume (SURVEY.md §5).  Here full training state round-trips:
model params (flat name->array dicts) and optimizer states (arbitrary optax
pytrees, saved as ordered leaves and restored into a freshly ``init``-ed
template, which pins the tree structure to the optimizer definition).

Format: one directory per step with plain .npz files + a JSON manifest —
dependency-free, mmap-friendly, and scp-able.  Trained params can also be
exported straight to the reference-compatible .ggml format via
vits_tpu.io.loader.export_to_ggml.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _save_flat(path: str, flat: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def _load_flat(path: str) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def _save_pytree(path: str, tree: Any) -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def _load_pytree(path: str, template: Any) -> Any:
    """Restore leaves into ``template``'s structure (e.g. a fresh opt.init())."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template expects "
            f"{treedef.num_leaves} — optimizer definition changed?"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    directory: str,
    step: int,
    gen_params: dict,
    gen_opt_state: Any = None,
    disc_params: Optional[dict] = None,
    disc_opt_state: Any = None,
    metadata: Optional[dict] = None,
    keep: int = 3,
) -> str:
    """Write checkpoint ``directory/step_<N>/``; prunes old steps beyond ``keep``."""
    ckpt_dir = os.path.join(directory, f"step_{step:08d}")
    os.makedirs(ckpt_dir, exist_ok=True)
    _save_flat(os.path.join(ckpt_dir, "gen_params.npz"), gen_params)
    manifest = {"step": step, "has_disc": disc_params is not None,
                "has_gen_opt": gen_opt_state is not None,
                "has_disc_opt": disc_opt_state is not None,
                "metadata": metadata or {}}
    if gen_opt_state is not None:
        _save_pytree(os.path.join(ckpt_dir, "gen_opt.npz"), gen_opt_state)
    if disc_params is not None:
        _save_flat(os.path.join(ckpt_dir, "disc_params.npz"), disc_params)
    if disc_opt_state is not None:
        _save_pytree(os.path.join(ckpt_dir, "disc_opt.npz"), disc_opt_state)
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    if keep:
        steps = sorted(
            d for d in os.listdir(directory)
            if d.startswith("step_") and os.path.isdir(os.path.join(directory, d))
        )
        for stale in steps[:-keep]:
            stale_dir = os.path.join(directory, stale)
            for name in os.listdir(stale_dir):
                os.remove(os.path.join(stale_dir, name))
            os.rmdir(stale_dir)
    return ckpt_dir


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(directory)
        if d.startswith("step_") and os.path.isdir(os.path.join(directory, d))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str,
    step: Optional[int] = None,
    gen_opt_template: Any = None,
    disc_opt_template: Any = None,
):
    """Returns dict with step, gen_params, disc_params, gen_opt_state,
    disc_opt_state, metadata (None where absent)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    ckpt_dir = os.path.join(directory, f"step_{step:08d}")
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    out = {
        "step": manifest["step"],
        "metadata": manifest.get("metadata", {}),
        "gen_params": _load_flat(os.path.join(ckpt_dir, "gen_params.npz")),
        "disc_params": None,
        "gen_opt_state": None,
        "disc_opt_state": None,
    }
    if manifest.get("has_disc"):
        out["disc_params"] = _load_flat(os.path.join(ckpt_dir, "disc_params.npz"))
    if manifest.get("has_gen_opt") and gen_opt_template is not None:
        out["gen_opt_state"] = _load_pytree(
            os.path.join(ckpt_dir, "gen_opt.npz"), gen_opt_template
        )
    if manifest.get("has_disc_opt") and disc_opt_template is not None:
        out["disc_opt_state"] = _load_pytree(
            os.path.join(ckpt_dir, "disc_opt.npz"), disc_opt_template
        )
    return out
