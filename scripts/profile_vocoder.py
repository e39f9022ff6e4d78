"""Per-stage vocoder profiling with MFU / roofline accounting.

For each HiFiGAN upsample stage (MMS: 4 stages, channels 256/128/64/32) this
times the resblock trio and the conv-transpose upsampler separately, computes
analytic FLOPs and minimum HBM bytes, and reports %-of-MXU-peak and
%-of-HBM-peak — answering "is this stage compute- or bandwidth-bound, and how
far from the roofline are we?" (round-1 gap: no MFU accounting anywhere).

Writes/updates BENCH_DETAIL.json at the repo root so per-stage numbers are
diffable round over round.

Usage:
    python scripts/profile_vocoder.py [--frames 1024] [--pallas] [--iters 20]

Peak numbers are TPU v5e (the bench chip): 197 TFLOP/s bf16 MXU (fp32 inputs
run as bf16 multiplies with fp32 accumulation under JAX's DEFAULT matmul
precision), 819 GB/s HBM.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = {"float32": 197e12, "bfloat16": 197e12}  # DEFAULT precision: bf16 MXU
PEAK_HBM = 819e9  # bytes/s


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def resblock_flops(T, C, kernel_sizes, dilation_sizes):
    """MACs*2 for the full per-stage resblock trio (conv1+conv2 per pair)."""
    total = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        total += len(dils) * 2 * (2 * T * C * C * k)  # 2 convs per pair
    return total


def resblock_min_bytes(T, C, n_resblocks, dtype_bytes=4):
    """Roofline minimum: read input once, write output once, per resblock
    (weights are negligible)."""
    return n_resblocks * 2 * T * C * dtype_bytes


def upsampler_flops(T_out, C_in, C_out, k, stride):
    # conv_transpose as input-dilated conv: every output sample sees k/stride
    # taps of C_in inputs (exactly k*T_in*C_in*C_out MACs total)
    return 2 * (T_out // stride) * C_in * C_out * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--pallas", action="store_true", help="also time the fused Pallas path")
    ap.add_argument("--json-out", default=os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json"))
    ap.add_argument("--tag", default="vocoder_stages")
    args = ap.parse_args()

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.params import ParamView
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import _fused_resblock_call, _resblock, hifigan

    config = VitsConfig()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dtype_bytes = 2 if args.dtype == "bfloat16" else 4
    params = {
        k: jnp.asarray(v).astype(dtype) if v.dtype == np.float32 else jnp.asarray(v)
        for k, v in random_params(config, keep_training=False).items()
    }
    p = ParamView(params).sub("decoder")

    B, F = args.batch, args.frames
    rng = np.random.default_rng(0)
    num_kernels = len(config.resblock_kernel_sizes)
    slope = config.leaky_relu_slope

    print(f"backend={jax.default_backend()} frames={F} batch={B} dtype={args.dtype}",
          flush=True)

    stages = []
    C = config.upsample_initial_channel
    T = F
    for i, rate in enumerate(config.upsample_rates):
        C //= 2
        T *= rate
        stages.append({"stage": i, "T": T, "C": C, "rate": rate,
                       "k_up": config.upsample_kernel_sizes[i]})

    detail = {"tag": args.tag, "frames": F, "batch": B, "dtype": args.dtype,
              "backend": jax.default_backend(), "stages": []}

    for st in stages:
        i, T, C = st["stage"], st["T"], st["C"]
        x = jnp.asarray(rng.standard_normal((B, T, C)), dtype)

        def trio(x, i=i):
            out = None
            for j in range(num_kernels):
                block = p.sub(f"resblocks.{i * num_kernels + j}")
                r = _resblock(block, x, None, config.resblock_kernel_sizes[j],
                              config.resblock_dilation_sizes[j], slope)
                out = r if out is None else out + r
            return out / num_kernels

        ms_xla = timeit(jax.jit(trio), x, iters=args.iters)
        gflop = resblock_flops(T, C, config.resblock_kernel_sizes,
                               config.resblock_dilation_sizes) * B / 1e9
        min_gb = resblock_min_bytes(T, C, num_kernels, dtype_bytes) * B / 1e9
        row = {
            **st,
            "resblock_trio_ms_xla": round(ms_xla, 3),
            "resblock_gflop": round(gflop, 2),
            "resblock_min_gb": round(min_gb, 4),
            "mfu_xla_pct": round(100 * gflop / 1e3 / (ms_xla / 1e3) / (PEAK_FLOPS[args.dtype] / 1e12), 1),
            "hbm_xla_pct": round(100 * (min_gb / (ms_xla / 1e3)) / (PEAK_HBM / 1e9), 1),
        }

        if args.pallas:
            def trio_pallas(x, i=i):
                out = None
                for j in range(num_kernels):
                    block = p.sub(f"resblocks.{i * num_kernels + j}")
                    r = _fused_resblock_call(
                        block, x, None, config.resblock_kernel_sizes[j],
                        config.resblock_dilation_sizes[j], slope)
                    out = r if out is None else out + r
                return out / num_kernels

            try:
                ms_pl = timeit(jax.jit(trio_pallas), x, iters=args.iters)
                row["resblock_trio_ms_pallas"] = round(ms_pl, 3)
                row["mfu_pallas_pct"] = round(
                    100 * gflop / 1e3 / (ms_pl / 1e3) / (PEAK_FLOPS[args.dtype] / 1e12), 1)
                row["pallas_speedup"] = round(ms_xla / ms_pl, 2)
            except Exception as exc:  # narrow stages may be ineligible
                row["resblock_trio_ms_pallas"] = None
                row["pallas_error"] = f"{type(exc).__name__}: {str(exc)[:120]}"

        detail["stages"].append(row)
        print(json.dumps(row), flush=True)

    # Upsamplers + whole vocoder
    from vits_tpu.ops.conv import conv_transpose1d, leaky_relu

    ups_rows = []
    C_in, T_in = config.upsample_initial_channel, F
    for i, rate in enumerate(config.upsample_rates):
        k = config.upsample_kernel_sizes[i]
        x = jnp.asarray(rng.standard_normal((B, T_in, C_in)), dtype)

        def up(x, i=i, k=k, rate=rate):
            return conv_transpose1d(
                x, p[f"upsampler.{i}.weight"], p[f"upsampler.{i}.bias"],
                stride=rate, padding=(k - rate) // 2)

        ms = timeit(jax.jit(up), x, iters=args.iters)
        gflop = upsampler_flops(T_in * rate, C_in, C_in // 2, k, rate) * B / 1e9
        ups_rows.append({"stage": i, "upsampler_ms": round(ms, 3),
                         "upsampler_gflop": round(gflop, 2)})
        print(json.dumps(ups_rows[-1]), flush=True)
        C_in //= 2
        T_in *= rate

    detail["upsamplers"] = ups_rows

    lat = jnp.asarray(rng.standard_normal((B, F, config.flow_size)), dtype)
    mask3 = jnp.ones((B, F, 1), dtype)
    pv = ParamView(params)
    voc_xla = timeit(jax.jit(lambda z, m: hifigan(pv, config, z, m, use_pallas=False)),
                     lat, mask3, iters=args.iters)
    detail["vocoder_ms_xla"] = round(voc_xla, 3)
    if args.pallas:
        voc_pl = timeit(jax.jit(lambda z, m: hifigan(pv, config, z, m, use_pallas=True)),
                        lat, mask3, iters=args.iters)
        detail["vocoder_ms_pallas"] = round(voc_pl, 3)
    total_gflop = sum(r["resblock_gflop"] for r in detail["stages"]) + \
        sum(r["upsampler_gflop"] for r in ups_rows)
    detail["vocoder_gflop"] = round(total_gflop, 1)
    detail["vocoder_mfu_xla_pct"] = round(
        100 * total_gflop / 1e3 / (voc_xla / 1e3) / (PEAK_FLOPS[args.dtype] / 1e12), 1)
    audio_sec = B * F * config.total_upsample / config.sampling_rate
    detail["vocoder_xrt_xla"] = round(audio_sec / (voc_xla / 1e3), 1)
    print(json.dumps({k: v for k, v in detail.items() if k != "stages"}), flush=True)

    # merge into BENCH_DETAIL.json keyed by tag
    out_path = os.path.abspath(args.json_out)
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    existing[args.tag] = detail
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
