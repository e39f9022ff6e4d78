"""Micro-shootout: 1-D conv formulations at HiFiGAN shapes on TPU.

The reference's analogue is bench_simd.cpp (dot-product/conv inner-loop
variants).  Contenders:

Regular dilated convs (resblock shapes):
  a) lax.conv_general_dilated (NHC)
  b) shift-matmul: y = sum_k shift(x, k*dil) @ W[k]  (k explicit MXU matmuls)
  c) im2col + single matmul

Transposed convs (upsampler shapes, --transpose):
  a) input-dilated conv_general_dilated (ops/conv.py fallback path)
  b) dense matmul + strided overlap-add (ops/conv.py fast path; measured
     ~1.3x faster on the wide stages of a v5e — the basis for the
     C_in >= 256 gate in conv_transpose1d)

Run: python scripts/bench_conv_variants.py [--transpose]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def conv_xla(x, w, dil):
    return lax.conv_general_dilated(
        x, w, (1,), ((dil * (w.shape[0] - 1) // 2,) * 2,),
        rhs_dilation=(dil,), dimension_numbers=("NHC", "HIO", "NHC"),
    )


def conv_shift(x, w, dil):
    k = w.shape[0]
    pad = dil * (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    out = None
    for i in range(k):
        piece = lax.dynamic_slice_in_dim(xp, i * dil, T, axis=1)
        term = jnp.einsum("btc,cd->btd", piece, w[i])
        out = term if out is None else out + term
    return out


def conv_im2col(x, w, dil):
    k = w.shape[0]
    pad = dil * (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    cols = jnp.stack(
        [lax.dynamic_slice_in_dim(xp, i * dil, T, axis=1) for i in range(k)], axis=2
    )  # (B, T, k, C)
    return jnp.einsum("btkc,kcd->btd", cols, w)


def bench_transpose():
    """Transposed-conv formulations at the HiFiGAN upsampler shapes."""
    from vits_tpu.ops.conv import _conv_transpose_matmul

    def convt_dilated(x, kernel, stride, padding):
        k = kernel.shape[0]
        pad = k - 1 - padding
        return lax.conv_general_dilated(
            x, kernel, (1,), ((pad, pad),), lhs_dilation=(stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    rng = np.random.default_rng(0)
    for label, B, T, Cin, Cout, k, s in [
        ("upsample1 512->256 k16s8", 1, 1024, 512, 256, 16, 8),
        ("upsample2 256->128 k16s8", 1, 8192, 256, 128, 16, 8),
        ("upsample3 128->64 k4s2", 1, 65536, 128, 64, 4, 2),
        ("upsample4 64->32 k4s2", 1, 131072, 64, 32, 4, 2),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, Cin)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((k, Cin, Cout)) * 0.05, jnp.float32)
        p = (k - s) // 2
        f1 = jax.jit(lambda x: convt_dilated(x, kern, s, p))
        f2 = jax.jit(lambda x: _conv_transpose_matmul(x, kern, None, s, p))
        err = np.abs(np.asarray(f1(x)) - np.asarray(f2(x))).max()
        print(f"{label:>26}: dilated={timeit(f1, x):7.3f}ms "
              f"matmul_oa={timeit(f2, x):7.3f}ms  maxerr={err:.2e}")


def main():
    import sys as _sys

    if "--transpose" in _sys.argv:
        bench_transpose()
        return
    shapes = [
        # (label, B, T, C, k, dil)  — HiFiGAN stage shapes for 1024 frames
        ("stage1 res k11d5", 1, 8192, 256, 11, 5),
        ("stage2 res k11d5", 1, 65536, 128, 11, 5),
        ("stage3 res k11d1", 1, 131072, 64, 11, 1),
        ("stage4 res k7d1", 1, 262144, 32, 7, 1),
        ("wavenet k5d1", 1, 1024, 192, 5, 1),
        ("batch8 stage2", 8, 65536, 128, 11, 5),
    ]
    rng = np.random.default_rng(0)
    for label, B, T, C, k, dil in shapes:
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, C, C)), jnp.float32)
        fns = {
            "xla_conv": jax.jit(lambda x, w, d=dil: conv_xla(x, w, d)),
            "shift_mm": jax.jit(lambda x, w, d=dil: conv_shift(x, w, d)),
            "im2col": jax.jit(lambda x, w, d=dil: conv_im2col(x, w, d)),
        }
        times = {name: timeit(fn, x, w) for name, fn in fns.items()}
        # correctness cross-check
        ref = np.asarray(fns["xla_conv"](x, w))
        for name, fn in fns.items():
            np.testing.assert_allclose(np.asarray(fn(x, w)), ref, atol=2e-2)
        best = min(times, key=times.get)
        print(f"{label:>18}: " + "  ".join(f"{n}={v:7.3f}ms" for n, v in times.items())
              + f"   best={best}")


if __name__ == "__main__":
    main()
