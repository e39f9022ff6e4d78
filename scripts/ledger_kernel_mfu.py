"""Executed-FLOP MFU ledger for the four fused vocoder kernels, per stage.

The round-2 MFU ledger (scripts/profile_vocoder.py) divides ALGORITHMIC
conv FLOPs by wall-clock time — both sides of that ratio are wrong for
optimization work: wall-clock through the tunnel is unreliable (see
BENCH_DETAIL ``measurement_methodology``) and the packed shift-matmul
algebra EXECUTES more FLOPs than the algorithmic conv (every (128,128)
shift matrix is dense on the MXU no matter how many taps landed in it).

This script times each stage kernel in ISOLATION on the profiler's device
lane and divides by FLOPs counted from the kernel's own static plan:

  * wide trio (C>=128): k dense (rows, C)x(C, C) dots per conv — executed
    == algorithmic (plus tile-halo overhead);
  * packed stage (C<128): len(shifts) (rows, 128)x(128, 128) matmuls per
    conv + residual block-permutation matmuls + packed upsampler/conv_post
    matrices — executed > algorithmic by the packing inflation factor.

Output per stage: device ms, executed GFLOP, executed-MFU (how well the
kernel runs what it chose to run) and algorithmic-MFU (how good the choice
was) — the two levers are different work.

Usage: python scripts/ledger_kernel_mfu.py [--frames 1024] [--update-detail]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

PEAK_BF16 = 197e12  # TPU v5e MXU, bf16 multiply / fp32 accumulate


def trio_executed_gflop(T, C, kernel_sizes, dilations, tile_t=2048):
    """Executed FLOPs of fused_resblock_trio: per-tap dense dots over the
    halo-extended window (ops/pallas/resblock.py::_trio_kernel)."""
    from vits_tpu.ops.pallas.resblock import total_halo

    halos = [total_halo(k, tuple(d)) for k, d in zip(kernel_sizes, dilations)]
    HO = max(halos)
    tile = min(tile_t, T)
    n_tiles = -(-T // tile)
    flops = 0
    for k, dils in zip(kernel_sizes, dilations):
        cur = tile + 2 * HO  # window rows at this block's first pair
        for d in dils:
            h1, h2 = d * (k - 1) // 2, (k - 1) // 2
            mid, out = cur - 2 * h1, cur - 2 * h1 - 2 * h2
            flops += 2 * k * mid * C * C  # conv1: k taps at mid rows
            flops += 2 * k * out * C * C  # conv2
            cur = out
    return flops * n_tiles / 1e9


def stage_executed_gflop(C_in, C_out, rate, k_up, kernel_sizes, dilations,
                        T_out, tile_p, final=None):
    """Executed FLOPs of fused_stage from its own _stage_plan."""
    from vits_tpu.ops.pallas.stage import _stage_plan

    rb_meta = tuple((k, tuple(d)) for k, d in zip(kernel_sizes, dilations))
    meta = _stage_plan(rb_meta, k_up, rate, (k_up - rate) // 2,
                       C_in, C_out, final=final)
    g_out = meta["g_out"]
    rows_tile = tile_p  # output rows written per tile
    n_tiles = -(-(T_out // g_out) // tile_p)
    # upsampler matmuls: (rows_u, g_in*C_in) x (g_in*C_in, g_out*C_out)
    rows_u = tile_p + 2 * (meta["ho"] // g_out)  # upsampled working rows
    flops = len(meta["u_shifts"]) * 2 * rows_u * 128 * 128
    n_mats = 0
    for blk in meta["blocks"]:
        for pair in blk["pairs"]:
            n_mats += len(pair["s1"]) + len(pair["s2"]) + len(pair["sr"])
    flops += n_mats * 2 * rows_u * 128 * 128
    if meta["wave"] is not None:
        flops += len(meta["wave"]["shifts"]) * 2 * rows_tile * 128 * g_out
    return flops * n_tiles / 1e9, n_mats + len(meta["u_shifts"])


def algorithmic_gflop(T_out, C_out, kernel_sizes, dilations,
                      C_in=None, rate=None, k_up=None, k_post=None):
    f = 0
    for k, dils in zip(kernel_sizes, dilations):
        f += len(dils) * 2 * (2 * T_out * C_out * C_out * k)
    if k_up is not None:
        f += 2 * (T_out // rate) * C_in * C_out * k_up * rate  # conv_transpose
    if k_post is not None:
        f += 2 * T_out * C_out * 1 * k_post
    return f / 1e9


def profile_one(fn, *args):
    """Device-lane ms for one dispatch of fn (profiler ground truth)."""
    import glob
    import gzip
    import tempfile

    import jax

    np.asarray(jax.block_until_ready(fn(*args))).sum()  # compile + quiesce
    tmp = tempfile.mkdtemp(prefix="ledger_")
    with jax.profiler.trace(tmp):
        np.asarray(jax.block_until_ready(fn(*args))).sum()
    path = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    tids = {}
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e.get("pid") == 3:
            tids[e["tid"]] = e["args"].get("name")
    mod_tid = next((k for k, v in tids.items() if v == "XLA Modules"), None)
    total = kernel_ms = 0.0
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != 3:
            continue
        if e["tid"] == mod_tid:
            total += e["dur"] / 1e3
        elif "_lambda_" in e.get("name", ""):
            kernel_ms += e["dur"] / 1e3
    return total, kernel_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--update-detail", action="store_true")
    ap.add_argument("--value-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import _stage_resblock_dicts
    from vits_tpu.ops.pallas.resblock import fused_resblock_trio
    from vits_tpu.ops.pallas.stage import fused_stage
    from vits_tpu.io.params import ParamView

    config = VitsConfig()
    params = ParamView(
        {k: jnp.asarray(v)
         for k, v in random_params(config, keep_training=False).items()})
    p = params.sub("decoder")
    ks, dils = config.resblock_kernel_sizes, config.resblock_dilation_sizes
    vd = jnp.dtype(args.value_dtype)
    rng = np.random.default_rng(0)

    frames = args.frames
    rows = []
    T = frames
    for i, rate in enumerate(config.upsample_rates):
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]
        T_out = T * rate
        alg = algorithmic_gflop(T_out, c_out, ks, dils, C_in=c_in, rate=rate,
                                k_up=config.upsample_kernel_sizes[i],
                                k_post=(7 if i == len(config.upsample_rates) - 1
                                        else None))
        if c_out >= 128:
            # wide stage: trio kernel alone (the upsampler runs in XLA)
            x = jnp.asarray(rng.standard_normal((1, T_out, c_out)) * 0.3,
                            jnp.float32)
            blocks = _stage_resblock_dicts(p, config, i)
            tile = 8192 if T_out >= 32768 else 2048  # hifigan call-site choice
            fn = jax.jit(lambda x, blocks=blocks, tile=tile: fused_resblock_trio(
                x, blocks, slope=config.leaky_relu_slope, tile_t=tile,
                value_dtype=vd))
            total_ms, kern_ms = profile_one(fn, x)
            execd = trio_executed_gflop(T_out, c_out, ks, dils, tile_t=tile)
            alg_rb = algorithmic_gflop(T_out, c_out, ks, dils)
            n_mats = sum(2 * k * len(d) for k, d in zip(ks, dils))
            label = f"trio C={c_out} T={T_out}"
            alg = alg_rb  # upsampler not in this kernel
        else:
            is_last = i == len(config.upsample_rates) - 1
            final = None
            final_conv = None
            if is_last:
                wpost = p["conv_post.weight"]
                final_conv = (wpost, (wpost.shape[0] - 1) // 2)
                final = (wpost.shape[0], (wpost.shape[0] - 1) // 2)
            g_in = 128 // c_in
            if g_in > 1:
                x = jnp.asarray(
                    rng.standard_normal((1, T // g_in, 128)) * 0.3, jnp.float32)
                packed_in = T
            else:
                x = jnp.asarray(rng.standard_normal((1, T, c_in)) * 0.3,
                                jnp.float32)
                packed_in = None
            blocks = _stage_resblock_dicts(p, config, i)
            fn = jax.jit(lambda x, i=i, rate=rate, blocks=blocks,
                         packed_in=packed_in, final_conv=final_conv:
                         fused_stage(
                             x, p[f"upsampler.{i}.weight"],
                             p[f"upsampler.{i}.bias"], stride=rate,
                             up_padding=(config.upsample_kernel_sizes[i] - rate) // 2,
                             resblocks=blocks, slope=config.leaky_relu_slope,
                             packed_in=packed_in, packed_out=False,
                             final_conv=final_conv, value_dtype=vd))
            total_ms, kern_ms = profile_one(fn, x)
            execd, n_mats = stage_executed_gflop(
                c_in, c_out, rate, config.upsample_kernel_sizes[i], ks, dils,
                T_out, tile_p=2048 // (128 // c_out) * (128 // c_out), final=final)
            # actual tile_p comes from fused_stage internals; approximate via
            # the executed count's weak tile dependence (halo ~2% of tile)
            label = f"stage C={c_in}->{c_out} T_out={T_out}" + (
                " +conv_post" if final else "")
        sol_ms = execd / (PEAK_BF16 / 1e12)  # GFLOP / (GFLOP/ms)
        rows.append({
            "stage": i, "label": label, "device_ms": round(kern_ms, 3),
            "module_ms": round(total_ms, 3),
            "executed_gflop": round(execd, 1), "n_matmuls": n_mats,
            "algorithmic_gflop": round(alg, 1),
            "sol_ms_at_peak": round(sol_ms, 3),
            "mfu_executed_pct": round(100 * sol_ms / kern_ms, 1) if kern_ms else None,
            "mfu_algorithmic_pct": round(
                100 * (alg / (PEAK_BF16 / 1e12)) / kern_ms, 1) if kern_ms else None,
            "packing_inflation": round(execd / alg, 2),
        })
        print(rows[-1])
        T = T_out

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["kernel_mfu_ledger_r3"] = {
            "note": ("isolated device-lane per-stage kernel times vs EXECUTED "
                     "FLOPs (counted from the kernels' own static plans) and "
                     "algorithmic FLOPs; peak 197 TF/s bf16 (v5e). "
                     "mfu_executed = how well the kernel runs its chosen "
                     "matmuls; mfu_algorithmic = how good the choice is "
                     "(packing inflation is the gap)."),
            "frames": args.frames, "value_dtype": args.value_dtype,
            "stages": rows,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")


if __name__ == "__main__":
    main()
