"""HiFiGAN vocoder: transposed-conv upsampling + multi-receptive-field resblocks.

Rebuild of hifigan_graph (/root/reference/src/vits.cpp:541-644).  TPU-first
choices: NTC layout so the wide channel dims ride the MXU lanes, transposed
convs as input-dilated convs, and *mask propagation through every stage* —
after each conv the padded tail is re-zeroed with the stage's upsampled mask,
which (a) makes padded batch entries bit-identical to unpadded runs (each conv
then sees exactly the zero padding HF sees at its sequence end) and (b) is what
lets one static-shape program serve a whole batch of different lengths, which
the reference cannot do at all (bsz==1 asserts).

The final activation uses torch's default leaky_relu slope (0.01) like HF
``VitsHifiGan.forward`` — the reference deviates here by reusing
``leaky_relu_slope`` (vits.cpp:638); HF is the behavior oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.ops.conv import conv1d, conv_transpose1d, leaky_relu
from vits_tpu.ops.precision import stage_precision


def _resblock(
    p: ParamView,
    x: jax.Array,
    mask: jax.Array | None,
    kernel_size: int,
    dilations: tuple[int, ...],
    slope: float,
) -> jax.Array:
    """One multi-dilation residual block (vits.cpp:545-581 / HifiGanResidualBlock)."""
    for i, dilation in enumerate(dilations):
        residual = x
        h = leaky_relu(x, slope)
        h = conv1d(
            h,
            p[f"convs1.{i}.weight"],
            p[f"convs1.{i}.bias"],
            padding=(kernel_size * dilation - dilation) // 2,
            dilation=dilation,
        )
        if mask is not None:
            h = h * mask
        h = leaky_relu(h, slope)
        h = conv1d(
            h,
            p[f"convs2.{i}.weight"],
            p[f"convs2.{i}.bias"],
            padding=(kernel_size - 1) // 2,
        )
        if mask is not None:
            h = h * mask
        x = h + residual
    return x


def _fused_resblock_call(p, h, mask, kernel_size, dilations, slope, precision=None,
                         value_dtype=None):
    """Route one resblock through the fused Pallas kernel (bit-exact vs XLA)."""
    from vits_tpu.ops.pallas.resblock import fused_resblock

    pairs = len(dilations)
    w1 = jnp.stack([p[f"convs1.{i}.weight"] for i in range(pairs)])
    b1 = jnp.stack([p[f"convs1.{i}.bias"] for i in range(pairs)])
    w2 = jnp.stack([p[f"convs2.{i}.weight"] for i in range(pairs)])
    b2 = jnp.stack([p[f"convs2.{i}.bias"] for i in range(pairs)])
    lengths = None
    if mask is not None:
        lengths = jnp.sum(mask[..., 0].astype(jnp.float32), axis=1).astype(jnp.int32)
    return fused_resblock(
        h, w1, b1, w2, b2,
        kernel_size=kernel_size, dilations=tuple(dilations), slope=slope,
        # multi-pass precision tiers need ~2x scoped-VMEM scratch per tile
        tile_t=2048 if precision not in ("high", "highest") else 1024,
        lengths=lengths, precision=precision,
        value_dtype=value_dtype,
    )


def _stage_resblock_dicts(p: ParamView, config: VitsConfig, i: int):
    num_kernels = len(config.resblock_kernel_sizes)
    resblocks = []
    for j in range(num_kernels):
        block = p.sub(f"resblocks.{i * num_kernels + j}")
        pairs = len(config.resblock_dilation_sizes[j])
        resblocks.append(dict(
            kernel_size=config.resblock_kernel_sizes[j],
            dilations=tuple(config.resblock_dilation_sizes[j]),
            w1=jnp.stack([block[f"convs1.{n}.weight"] for n in range(pairs)]),
            b1=jnp.stack([block[f"convs1.{n}.bias"] for n in range(pairs)]),
            w2=jnp.stack([block[f"convs2.{n}.weight"] for n in range(pairs)]),
            b2=jnp.stack([block[f"convs2.{n}.bias"] for n in range(pairs)]),
        ))
    return resblocks


PACK_PREFIX = "__vocoder_pack__"
# Per-stage packed-array names; scale rows only exist in int8 packs.
STAGE_PACK_NAMES = ("wu", "bu", "w1_all", "b1_all", "w2_all", "b2_all",
                    "wr_all", "wq", "su", "s1", "s2", "sq")
TRIO_PACK_NAMES = ("w1", "b1", "w2", "b2", "s1", "s2")


def _quantize_conv_stack(w: jax.Array):
    """(pairs, k, C, C) fp32 -> int8 + per-(pair, out-channel) fp32 scales.

    Every tap of a pair shares its out-channel scale, so the kernel
    dequantizes with one row-broadcast multiply on the accumulated sum
    (ops/pallas/resblock.py::_trio_kernel)."""
    absmax = jnp.max(jnp.abs(w), axis=(1, 2))  # (pairs, C)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale[:, None, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def precompute_vocoder_packs(
    params: dict, config: VitsConfig, weight_format: str = "float32",
) -> dict:
    """Load-time packing of ALL fused-kernel vocoder weights.

    Returns flat ``{__vocoder_pack__...: array}`` entries to merge into the
    params dict; hifigan picks them up automatically.  Narrow (stage-fusable)
    stages get shift-matrix packs (skipping the per-dispatch scatters, see
    ops/pallas/stage.py::pack_stage_arrays); wide stages get the stacked
    resblock-trio weights under ``{stage}.rb{j}.*``.  ``weight_format``
    ("float32" | "bfloat16" | "int8") sets the HBM bytes/entry of the big
    weight arrays; int8 adds per-out-channel scale rows the kernels apply to
    their fp32 accumulators.  Call OUTSIDE jit on concrete params (int8
    checkpoints dequantize through ParamView first — per-column re-quant of
    the packed layout is numerically the same per-out-channel scheme).  Keys
    are engine-internal — exporters operate on loader-level params and never
    see them.
    """
    from vits_tpu.ops.pallas.stage import pack_stage_arrays

    if weight_format not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown weight_format {weight_format!r}")
    p = ParamView(params).sub("decoder")
    packs: dict = {}
    n_stages = len(config.upsample_rates)
    for i, rate in enumerate(config.upsample_rates):
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]
        if (128 % c_in == 0 and 128 % c_out == 0
                and (128 // c_out) == rate * (128 // c_in)):
            final_conv = None
            if i == n_stages - 1:
                wpost = p["conv_post.weight"]
                final_conv = (wpost, (wpost.shape[0] - 1) // 2)
            arrays = pack_stage_arrays(
                up_w, p[f"upsampler.{i}.bias"],
                _stage_resblock_dicts(p, config, i),
                stride=rate,
                up_padding=(config.upsample_kernel_sizes[i] - rate) // 2,
                final_conv=final_conv,
                weight_format=weight_format,
            )
            for name, arr in arrays.items():
                packs[f"{PACK_PREFIX}.{i}.{name}"] = arr
        elif c_out % 128 == 0:
            # wide stage: stack the trio weights once at load; int8/bf16 cut
            # their HBM->VMEM bytes (these are the LARGE vocoder weights).
            # The upsampler itself runs in XLA — store a bf16 copy so the
            # whole wide-stage glue segment (leaky -> conv_transpose -> mask)
            # can ride bf16 end-to-end when the kernels do (halves the
            # inter-stage HBM round-trips; device-lane win in BENCH_DETAIL
            # kernel_mfu_ledger_r3).
            if weight_format != "float32":
                packs[f"{PACK_PREFIX}.{i}.up_w"] = up_w.astype(jnp.bfloat16)
                packs[f"{PACK_PREFIX}.{i}.up_b"] = (
                    p[f"upsampler.{i}.bias"].astype(jnp.bfloat16))
            for j, blk in enumerate(_stage_resblock_dicts(p, config, i)):
                w1, w2 = blk["w1"], blk["w2"]
                entries = {"b1": blk["b1"], "b2": blk["b2"]}
                if weight_format == "int8":
                    entries["w1"], entries["s1"] = _quantize_conv_stack(w1)
                    entries["w2"], entries["s2"] = _quantize_conv_stack(w2)
                elif weight_format == "bfloat16":
                    entries["w1"] = w1.astype(jnp.bfloat16)
                    entries["w2"] = w2.astype(jnp.bfloat16)
                else:
                    entries["w1"], entries["w2"] = w1, w2
                for name, arr in entries.items():
                    packs[f"{PACK_PREFIX}.{i}.rb{j}.{name}"] = arr
    return packs


def hifigan(
    params: ParamView,
    config: VitsConfig,
    spectrogram: jax.Array,  # (B, T, flow_size) latents
    frame_mask: jax.Array | None = None,  # (B, T, 1)
    global_conditioning: jax.Array | None = None,  # (B, 1, speaker_emb)
    use_pallas: bool = False,
    pallas_precision: str | None = None,  # None = fast bf16 multiplies;
    #   "high"/"highest" = 3/6-pass; or a comma-joined PER-STAGE spec
    #   ("high,high,highest,highest") — see ops/precision.py
    pallas_value_dtype: str | None = None,  # kernel VMEM value dtype; None=fp32
    trainable: bool = False,  # gradient-capable kernels only: wide stages run
    #   the custom-VJP fused trio (ops/pallas/trio_grad.py), everything else
    #   falls back to XLA.  Requires frame_mask=None (training decodes
    #   unmasked fixed-length segments, train/step.py).
) -> jax.Array:
    """Latents -> waveform (B, T * prod(upsample_rates))."""
    p = params.sub("decoder")
    num_kernels = len(config.resblock_kernel_sizes)
    slope = config.leaky_relu_slope
    vd = jnp.float32 if pallas_value_dtype is None else jnp.dtype(pallas_value_dtype)

    h = conv1d(spectrogram, p["conv_pre.weight"], p["conv_pre.bias"], padding=3)
    if global_conditioning is not None:
        h = h + conv1d(global_conditioning, p["cond.weight"], p["cond.bias"])
    mask = frame_mask
    if mask is not None:
        h = h * mask

    # bf16-serving glue: once the kernels run bf16 VMEM values, keeping the
    # XLA segments between them (leaky -> conv_transpose -> mask) in fp32
    # just doubles every inter-stage HBM round-trip and adds cast/pad ops —
    # carry the activation in bf16 end-to-end (the kernels accumulate fp32
    # either way; the fp32/highest parity path is untouched).
    bf16_glue = use_pallas and not trainable and vd == jnp.bfloat16
    if bf16_glue:
        h = h.astype(vd)
        if mask is not None:
            mask = mask.astype(vd)  # 0/1 exact in bf16

    def _stage_fusable(c_in, c_out, rate, carry_dtype=None):
        return (
            use_pallas
            and not trainable  # the stage kernel has no VJP yet
            and (carry_dtype or h.dtype) in (jnp.float32, vd)
            and 128 % c_in == 0
            and 128 % c_out == 0
            and (128 // c_out) == rate * (128 // c_in)
        )

    n_stages = len(config.upsample_rates)
    packed_T = None  # logical (B, T, C) time length while h is packed (B,R,128)
    for i, rate in enumerate(config.upsample_rates):
        prec_i = stage_precision(pallas_precision, i)
        kernel_size = config.upsample_kernel_sizes[i]
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]

        # Whole-stage fused kernel (leaky + conv-transpose + all resblocks in
        # one VMEM-resident Pallas program) for the narrow tail stages where
        # XLA runs at 3-8% MFU; see ops/pallas/stage.py for applicability.
        # The shift-matrix packing happens ONCE at load time via
        # precompute_vocoder_packs (the ``arrays=`` fast path below); only the
        # cheap jnp.stack of raw resblock weights remains traced — and is
        # unused by the kernel when packed arrays are present.
        if _stage_fusable(c_in, c_out, rate):
            from vits_tpu.ops.pallas.stage import fused_stage

            lengths = None
            if mask is not None:
                lengths = jnp.sum(mask[..., 0].astype(jnp.float32), axis=1).astype(jnp.int32)
            is_last = i == n_stages - 1
            # Chain consecutive fused stages in the PACKED layout (the
            # unpack/repack reshapes between them are pure relayout cost),
            # and fold conv_post+tanh into the terminal stage: the kernel
            # then emits the waveform itself and the stage's (B, T, C)
            # output never round-trips HBM.
            next_w = None if is_last else p[f"upsampler.{i + 1}.weight"]
            chain_next = (
                not is_last
                and _stage_fusable(
                    next_w.shape[1], next_w.shape[2],
                    config.upsample_rates[i + 1], carry_dtype=vd)
            )
            final_conv = None
            if is_last:
                wpost = p["conv_post.weight"]
                final_conv = (wpost, (wpost.shape[0] - 1) // 2)
            # Load-time packed weights (precompute_vocoder_packs merged into
            # the params dict) skip the per-dispatch shift-matrix scatters.
            arrays = None
            if f"{PACK_PREFIX}.{i}.wu" in params:
                arrays = {
                    n: params[f"{PACK_PREFIX}.{i}.{n}"]
                    for n in STAGE_PACK_NAMES
                    if f"{PACK_PREFIX}.{i}.{n}" in params
                }
            out = fused_stage(
                h, up_w, p[f"upsampler.{i}.bias"],
                stride=rate, up_padding=(kernel_size - rate) // 2,
                resblocks=_stage_resblock_dicts(p, config, i),
                slope=slope, lengths=lengths,
                precision=prec_i,
                tile_t=(2048 if prec_i not in ("high", "highest")
                        else 1024),  # multi-pass tiers: 2x VMEM scratch/tile
                packed_in=packed_T, packed_out=chain_next,
                arrays=arrays, final_conv=final_conv,
                value_dtype=vd,
            )
            if final_conv is not None:
                return out  # already tanh'd, masked waveform (B, T)
            T_in = packed_T if packed_T is not None else h.shape[1]
            packed_T = T_in * rate if chain_next else None
            h = out
            if mask is not None:
                mask = jnp.repeat(mask, rate, axis=1)
            continue

        h = leaky_relu(h, slope)
        # per-phase matmul formulation when the HiFiGAN geometry allows it
        # (k % s == 0, symmetric padding): clean layouts vs the lhs-dilated
        # conv lowering (see ops/conv.py::_conv_transpose_phases)
        method = (
            "phases"
            if kernel_size % rate == 0
            and 2 * ((kernel_size - rate) // 2) == kernel_size - rate
            else "dilated"
        )
        up_b = p[f"upsampler.{i}.bias"]
        if bf16_glue and f"{PACK_PREFIX}.{i}.up_w" in params:
            # load-time bf16 upsampler weights keep the whole segment in the
            # carry dtype (fp32 weights would promote the conv back to fp32)
            up_w = params[f"{PACK_PREFIX}.{i}.up_w"]
            up_b = params[f"{PACK_PREFIX}.{i}.up_b"]
        h = conv_transpose1d(
            h,
            up_w,
            up_b,
            stride=rate,
            padding=(kernel_size - rate) // 2,
            method=method,
        )
        if mask is not None:
            # Upsample the frame mask: each valid frame covers `rate` samples.
            mask = jnp.repeat(mask, rate, axis=1)
            h = h * mask

        # Fused Pallas path.  Wide stages (C % 128 == 0) run ALL resblocks +
        # the mean in ONE kernel (fused_resblock_trio: 1 read + 1 write of
        # the activation instead of 3 DMAs + 3 writes + an XLA mean); narrow
        # stages (C = 64/32) use the time-packed per-resblock variant that
        # folds 128/C timesteps into the lane dim.
        channels = h.shape[-1]
        wide = channels % 128 == 0
        fuse = (
            use_pallas
            and not trainable
            and (wide or 128 % channels == 0)
            and h.dtype in (jnp.float32, vd)
        )

        # Training path: wide stages through the custom-VJP fused trio —
        # jax.grad flows, forward runs fused (ops/pallas/trio_grad.py).
        if (use_pallas and trainable and wide and mask is None
                and h.dtype == jnp.float32):
            from vits_tpu.ops.pallas.trio_grad import make_trainable_trio

            blocks = _stage_resblock_dicts(p, config, i)
            f = make_trainable_trio(
                [{"kernel_size": b["kernel_size"], "dilations": b["dilations"]}
                 for b in blocks],
                slope=slope, tile_t=2048, precision=prec_i,
            )
            h = f(h, tuple((b["w1"], b["b1"], b["w2"], b["b2"]) for b in blocks))
            continue

        if fuse and wide:
            from vits_tpu.ops.pallas.resblock import fused_resblock_trio

            lengths = None
            if mask is not None:
                lengths = jnp.sum(mask[..., 0].astype(jnp.float32), axis=1).astype(jnp.int32)
            # Load-time stacked (and possibly int8/bf16) trio weights from
            # precompute_vocoder_packs; fall back to in-trace stacking.
            blocks = None
            if f"{PACK_PREFIX}.{i}.rb0.w1" in params:
                blocks = []
                for j in range(num_kernels):
                    base = f"{PACK_PREFIX}.{i}.rb{j}."
                    blk = dict(
                        kernel_size=config.resblock_kernel_sizes[j],
                        dilations=tuple(config.resblock_dilation_sizes[j]),
                    )
                    for name in TRIO_PACK_NAMES:
                        if base + name in params:
                            blk[name] = params[base + name]
                    blocks.append(blk)
            # Long stages prefer big tiles: at T=65536 the device-lane time
            # is 1.58 ms (tile 8192) vs 1.83 ms (tile 2048) — fewer grid
            # steps amortize per-tile DMA/mask overhead (BENCH_DETAIL
            # kernel_mfu_ledger_r3).  Short/wide stages OOM VMEM above 2048.
            # The multi-pass precision tiers ("high"/"highest") need more
            # scoped-VMEM scratch per tile — tile 2048 at fp32 6-pass busted
            # the 100 MB stack limit by 5% (round 4) — so they run at half
            # tile (exact parity is a fidelity mode, not the fast path).
            big_tile = prec_i not in ("high", "highest")
            h = fused_resblock_trio(
                h, blocks if blocks is not None
                else _stage_resblock_dicts(p, config, i),
                slope=slope,
                tile_t=((8192 if big_tile else 4096)
                        if h.shape[1] >= 32768
                        else (2048 if big_tile else 1024)),
                lengths=lengths,
                precision=prec_i, value_dtype=vd,
            )
            continue

        res_state = None
        for j in range(num_kernels):
            block = p.sub(f"resblocks.{i * num_kernels + j}")
            if fuse:
                block_out = _fused_resblock_call(
                    block, h, mask,
                    config.resblock_kernel_sizes[j],
                    config.resblock_dilation_sizes[j],
                    slope,
                    precision=prec_i,
                    value_dtype=vd,
                )
            else:
                block_out = _resblock(
                    block,
                    h,
                    mask,
                    config.resblock_kernel_sizes[j],
                    config.resblock_dilation_sizes[j],
                    slope,
                )
            res_state = block_out if res_state is None else res_state + block_out
        h = res_state / num_kernels

    h = leaky_relu(h, 0.01)  # torch default slope; see module docstring
    h = conv1d(h, p["conv_post.weight"], None, padding=3)
    waveform = jnp.tanh(h)
    if mask is not None:
        waveform = waveform * mask
    return waveform[..., 0]
