"""Fused TPU kernels (Pallas/Mosaic) with interpret-mode fallbacks.

Every kernel entry point takes ``interpret``: ``None`` (default) resolves to
"compiled on TPU, interpret elsewhere" via :func:`resolve_interpret`, so the
same engine/config runs anywhere — Mosaic only compiles for TPU, and without
this a CPU/GPU session with ``use_pallas_*`` forced on would crash inside
``pallas_call``.  Interpret mode is orders of magnitude slower; it exists for
correctness work (the CI suite pins kernels against XLA references with it).
"""

from __future__ import annotations


def resolve_interpret(interpret: bool | None) -> bool:
    """None -> interpret unless the session's default backend is a TPU.

    Resolved at trace time (backend choice is static under jit); sessions
    jitting for a non-default device should pass ``interpret`` explicitly.
    """
    if interpret is not None:
        return interpret
    import jax

    return jax.default_backend() not in ("tpu", "axon")
