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

    ``"high"`` (3-pass bf16x3) resolves to the ``"bf16x3"`` sentinel: Mosaic
    has no lowering for ``Precision.HIGH`` (round-4: "Unsupported dot
    precision: HIGH"), so the kernels implement the decomposition manually —
    every kernel dot goes through :func:`kernel_dot`, which expands the
    sentinel into hi/lo bf16 splits and three DEFAULT-precision MXU passes.
    """
    import jax

    if precision is None:
        return jax.lax.Precision.DEFAULT
    if precision == "high":
        return "bf16x3"
    return jax.lax.Precision(precision)


def kernel_dot(a, b, precision):
    """``jnp.dot`` on the MXU with fp32 accumulation, honoring ``"bf16x3"``.

    For a resolved :func:`resolve_precision` value this is a plain dot.  For
    the ``"bf16x3"`` sentinel (the user-level "high" tier) it emulates
    3-pass fp32 multiplies out of bf16 hardware passes: split each fp32
    operand x = hi + lo (hi = bf16(x), lo = bf16(x - hi)) and sum the three
    leading cross terms hi·hi + hi·lo + lo·hi, each a single-pass bf16 MXU
    dot accumulated in fp32.  The dropped lo·lo term is O(2^-16) relative —
    measured mel-L1 lands well under the 1e-3 BASELINE target at roughly
    half the 6-pass ``Precision.HIGHEST`` cost (BENCH_DETAIL
    ``fidelity_tiers_r4``).  The elementwise splits are VPU work ~k/128 of
    the matmul FLOPs — noise next to the passes they save.
    """
    import jax.numpy as jnp

    if precision == "bf16x3":
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        import jax

        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # precision pinned to DEFAULT: under the glue32 ambient context
        # (jax.default_matmul_precision("highest")) an unpinned dot would
        # stamp fp32 contract precision onto these bf16 operands, which
        # Mosaic rejects ("Bad lhs type" on tpu.matmul bf16 x bf16 with
        # contract_precision<fp32>) — same trap resolve_precision documents.
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def kernel_dot_general(a, b, dimension_numbers, precision):
    """:func:`kernel_dot` for arbitrary ``dot_general`` dimension numbers
    (the attention kernels contract transposed operands in place)."""
    import jax
    import jax.numpy as jnp

    if precision == "bf16x3":
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # DEFAULT pinned for the same reason as kernel_dot: never inherit
        # the ambient matmul-precision context inside a Mosaic kernel.
        d = lambda x, y: jax.lax.dot_general(
            x, y, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(a, b, dimension_numbers=dimension_numbers,
                               preferred_element_type=jnp.float32,
                               precision=precision)
