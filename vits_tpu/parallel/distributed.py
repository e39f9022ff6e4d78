"""Multi-host (multi-process) initialization helpers.

Single-slice meshes work without any of this; for multi-host pods or
multi-slice (DCN) deployments, call :func:`initialize` once per process before
any jax device use, then build meshes over the global device set as usual —
XLA routes intra-slice collectives over ICI and inter-slice over DCN by device
topology; no code changes in the model/train stack.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    heartbeat_timeout_seconds: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection defaults.

    On Cloud TPU pods all arguments are discovered from the metadata server;
    pass them explicitly for other clusters.

    ``heartbeat_timeout_seconds`` tunes JAX's built-in failure detector (the
    coordination service fatally terminates every task ~100 s after one stops
    heartbeating).  Deployments that want the training-level watchdog
    (train/watchdog.py) to decide first — it also catches a process that is
    alive but making no training progress, which the coordination service
    cannot see — should set this above the watchdog's ``stall_seconds``.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if heartbeat_timeout_seconds is not None:
        kwargs["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    jax.distributed.initialize(**kwargs)


def global_mesh(model: int = 1):
    """('data','model') mesh over every device across all processes."""
    from vits_tpu.parallel.mesh import make_mesh

    return make_mesh(model=model, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
