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


def _fused_resblock_call(p, h, mask, kernel_size, dilations, slope, precision=None):
    """Route one resblock through the fused Pallas kernel (bit-exact vs XLA)."""
    from vits_tpu.ops.pallas.resblock import fused_resblock

    pairs = len(dilations)
    w1 = jnp.stack([p[f"convs1.{i}.weight"] for i in range(pairs)])
    b1 = jnp.stack([p[f"convs1.{i}.bias"] for i in range(pairs)])
    w2 = jnp.stack([p[f"convs2.{i}.weight"] for i in range(pairs)])
    b2 = jnp.stack([p[f"convs2.{i}.bias"] for i in range(pairs)])
    lengths = None
    if mask is not None:
        lengths = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)
    return fused_resblock(
        h, w1, b1, w2, b2,
        kernel_size=kernel_size, dilations=tuple(dilations), slope=slope,
        tile_t=2048, lengths=lengths, precision=precision,
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


def precompute_vocoder_packs(params: dict, config: VitsConfig) -> dict:
    """Load-time packing of the stage-fusable vocoder weights.

    Returns flat ``{__vocoder_pack__.{stage}.{name}: array}`` entries to merge
    into the params dict; hifigan picks them up automatically and skips the
    per-dispatch shift-matrix scatters (see ops/pallas/stage.py::
    pack_stage_arrays).  Call OUTSIDE jit on concrete fp32 params.  Keys are
    engine-internal — exporters operate on loader-level params and never see
    them.
    """
    from vits_tpu.ops.pallas.stage import pack_stage_arrays

    p = ParamView(params).sub("decoder")
    packs: dict = {}
    n_stages = len(config.upsample_rates)
    for i, rate in enumerate(config.upsample_rates):
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]
        if not (128 % c_in == 0 and 128 % c_out == 0
                and (128 // c_out) == rate * (128 // c_in)):
            continue
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
        )
        for name, arr in arrays.items():
            packs[f"{PACK_PREFIX}.{i}.{name}"] = arr
    return packs


def hifigan(
    params: ParamView,
    config: VitsConfig,
    spectrogram: jax.Array,  # (B, T, flow_size) latents
    frame_mask: jax.Array | None = None,  # (B, T, 1)
    global_conditioning: jax.Array | None = None,  # (B, 1, speaker_emb)
    use_pallas: bool = False,
    pallas_precision: str | None = None,  # None = fast bf16 multiplies
) -> jax.Array:
    """Latents -> waveform (B, T * prod(upsample_rates))."""
    p = params.sub("decoder")
    num_kernels = len(config.resblock_kernel_sizes)
    slope = config.leaky_relu_slope

    h = conv1d(spectrogram, p["conv_pre.weight"], p["conv_pre.bias"], padding=3)
    if global_conditioning is not None:
        h = h + conv1d(global_conditioning, p["cond.weight"], p["cond.bias"])
    mask = frame_mask
    if mask is not None:
        h = h * mask

    def _stage_fusable(c_in, c_out, rate):
        return (
            use_pallas
            and h.dtype == jnp.float32
            and 128 % c_in == 0
            and 128 % c_out == 0
            and (128 // c_out) == rate * (128 // c_in)
        )

    n_stages = len(config.upsample_rates)
    packed_T = None  # logical (B, T, C) time length while h is packed (B,R,128)
    for i, rate in enumerate(config.upsample_rates):
        kernel_size = config.upsample_kernel_sizes[i]
        up_w = p[f"upsampler.{i}.weight"]
        c_in, c_out = up_w.shape[1], up_w.shape[2]

        # Whole-stage fused kernel (leaky + conv-transpose + all resblocks in
        # one VMEM-resident Pallas program) for the narrow tail stages where
        # XLA runs at 3-8% MFU; see ops/pallas/stage.py for applicability.
        # Known cost: the weight stacking/packing below is traced over params
        # and so re-executes per dispatch — device-lane profiling shows it in
        # the sub-0.2 ms small-op categories; hoisting it to load time is a
        # round-3 cleanup (BENCH_DETAIL device_profile).
        if _stage_fusable(c_in, c_out, rate):
            from vits_tpu.ops.pallas.stage import fused_stage

            lengths = None
            if mask is not None:
                lengths = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)
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
                    config.upsample_rates[i + 1])
            )
            final_conv = None
            if is_last:
                wpost = p["conv_post.weight"]
                final_conv = (wpost, (wpost.shape[0] - 1) // 2)
            # Load-time packed weights (precompute_vocoder_packs merged into
            # the params dict) skip the per-dispatch shift-matrix scatters.
            arrays = None
            names = ["wu", "bu", "w1_all", "b1_all", "w2_all", "b2_all",
                     "wr_all"] + (["wq"] if final_conv is not None else [])
            if f"{PACK_PREFIX}.{i}.wu" in params:
                arrays = {n: params[f"{PACK_PREFIX}.{i}.{n}"] for n in names}
            out = fused_stage(
                h, up_w, p[f"upsampler.{i}.bias"],
                stride=rate, up_padding=(kernel_size - rate) // 2,
                resblocks=_stage_resblock_dicts(p, config, i),
                slope=slope, lengths=lengths,
                precision=pallas_precision,
                packed_in=packed_T, packed_out=chain_next,
                arrays=arrays, final_conv=final_conv,
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
        h = conv_transpose1d(
            h,
            up_w,
            p[f"upsampler.{i}.bias"],
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
            and (wide or 128 % channels == 0)
            and h.dtype == jnp.float32
        )

        if fuse and wide:
            from vits_tpu.ops.pallas.resblock import fused_resblock_trio

            lengths = None
            if mask is not None:
                lengths = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)
            h = fused_resblock_trio(
                h, _stage_resblock_dicts(p, config, i),
                slope=slope, tile_t=2048, lengths=lengths,
                precision=pallas_precision,
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
                    precision=pallas_precision,
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
