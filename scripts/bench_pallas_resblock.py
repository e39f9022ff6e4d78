"""Fused Pallas resblock vs XLA composite at HiFiGAN stage shapes (on TPU)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.ops.pallas.resblock import fused_resblock, xla_resblock


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    shapes = [
        # (label, B, T, C, k, dilations, tile)
        ("stage1 k11", 1, 8192, 256, 11, (1, 3, 5), 2048),
        ("stage2 k11", 1, 65536, 128, 11, (1, 3, 5), 4096),
        ("stage3 k11", 1, 131072, 64, 11, (1, 3, 5), 8192),
        ("stage2 k3", 1, 65536, 128, 3, (1, 3, 5), 4096),
        ("b8 stage2 k11", 8, 65536, 128, 11, (1, 3, 5), 4096),
    ]
    rng = np.random.default_rng(0)
    for label, B, T, C, k, dil, tile in shapes:
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((len(dil), k, C, C)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((len(dil), C)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((len(dil), k, C, C)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((len(dil), C)) * 0.05, jnp.float32)
        w1l = [w1[i] for i in range(len(dil))]
        b1l = [b1[i] for i in range(len(dil))]
        w2l = [w2[i] for i in range(len(dil))]
        b2l = [b2[i] for i in range(len(dil))]

        xla_fn = jax.jit(lambda x: xla_resblock(x, (w1l, b1l, w2l, b2l), k, dil, 0.1))
        pls_fn = jax.jit(lambda x: fused_resblock(
            x, w1, b1, w2, b2, kernel_size=k, dilations=dil, slope=0.1, tile_t=tile))

        ref = np.asarray(xla_fn(x))
        got = np.asarray(pls_fn(x))
        err = np.abs(ref - got).max()
        t_xla = timeit(xla_fn, x)
        t_pls = timeit(pls_fn, x)
        print(f"{label:>14}: xla={t_xla:8.3f}ms  pallas={t_pls:8.3f}ms  "
              f"speedup={t_xla / t_pls:4.2f}x  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
