"""Forward+backward time of the flash rel-attention vs XLA autodiff.

Grounds the training auto-enable threshold for the trainable attention
(ops/pallas/attention_grad.py): at which sequence length does the flash
forward + flash backward beat XLA attention + XLA autodiff?  Timing uses a
real ``device_get`` per step (through the tunneled TPU only fetches
synchronize — BENCH_DETAIL ``measurement_methodology``).

Usage: python scripts/bench_attention_grad.py [--lengths 256,512,1024,2048]
       [--steps 20] [--batch 8] [--update-detail]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="256,512,1024,2048")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--head-dim", type=int, default=96)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--update-detail", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.ops.pallas.attention_grad import (
        make_trainable_attention,
        xla_rel_attention,
    )

    B, H, d, w = args.batch, args.heads, args.head_dim, args.window
    results = {"backend": jax.default_backend(),
               "shape": {"batch": B, "heads": H, "head_dim": d, "window": w},
               "per_length_ms": {}}

    def timed(fn, argsv, n):
        out = fn(*argsv)
        np.asarray(jax.tree.leaves(out)[0])  # real sync (tunnel)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*argsv)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1000

    for L in [int(x) for x in args.lengths.split(",")]:
        rng = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        q, k, v = mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d)
        rk, rv = mk(2 * w + 1, d), mk(2 * w + 1, d)
        g0 = mk(B, H, L, d)
        lens = jnp.full((B,), L, jnp.int32)

        attn = make_trainable_attention(window=w)

        @jax.jit
        def grad_pallas(q, k, v, rk, rv):
            f = lambda *a: jnp.sum(attn(*a, lens) * g0)
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, rk, rv)

        @jax.jit
        def grad_xla(q, k, v, rk, rv):
            f = lambda *a: jnp.sum(xla_rel_attention(*a, w, lens) * g0)
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, rk, rv)

        ms_p = timed(grad_pallas, (q, k, v, rk, rv), args.steps)
        ms_x = timed(grad_xla, (q, k, v, rk, rv), args.steps)
        results["per_length_ms"][str(L)] = {
            "pallas_fwdbwd": round(ms_p, 3),
            "xla_fwdbwd": round(ms_x, 3),
            "speedup": round(ms_x / ms_p, 2),
        }
        print(L, results["per_length_ms"][str(L)], flush=True)

    print(json.dumps(results, indent=1))
    if args.update_detail:
        detail = json.load(open("BENCH_DETAIL.json"))
        detail["attention_grad_r3"] = {
            "note": ("flash rel-attention fwd+bwd (custom VJP, "
                     "ops/pallas/attention_grad.py) vs XLA autodiff; one "
                     "attention call, real-device_get timing"),
            **results,
        }
        json.dump(detail, open("BENCH_DETAIL.json", "w"), indent=1)
        print("BENCH_DETAIL.json updated", file=sys.stderr)


if __name__ == "__main__":
    main()
