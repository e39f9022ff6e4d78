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


def resolve_precision(precision):
    """Kernel-level precision string -> a PINNED jax.lax.Precision.

    ``None`` (the fast path: single-pass bf16 multiplies, fp32 accumulation)
    must resolve to ``Precision.DEFAULT`` explicitly, NOT be left as None:
    a dot with precision=None inherits the ambient
    ``jax.default_matmul_precision(...)`` context, and an engine running its
    glue at "highest" (EngineConfig.matmul_precision) would stamp fp32
    contract precision onto the kernels' bf16 dots — which Mosaic rejects
    (round-4: tpu.matmul vector<...xbf16> with contract_precision<fp32>).
    The kernels' precision is their own policy, never ambient.
    """
    import jax

    if precision is None:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision(precision)
