"""Torch-layout state dict -> TPU-canonical JAX parameter pytree.

Parameters are kept as a flat ``dict[str, jnp.ndarray]`` keyed by the HF dotted
names — the same naming the reference resolves with its prefix stack
(/root/reference/src/vits_model_data.cpp:136-151) — but with weight layouts
converted once at load time into the layouts the TPU compute path consumes:

  * ``nn.Linear``      (out, in)        -> (in, out)       so ``x @ w`` hits the MXU
  * ``nn.Conv1d``      (out, in/g, k)   -> (k, in/g, out)  lax ``('NHC','HIO','NHC')``
  * ``ConvTranspose1d``(in, out, k)     -> (k, out, in), kernel reversed — expressed
    as an input-dilated regular conv (see :func:`vits_tpu.ops.conv.conv_transpose_1d`)
  * everything else (embeddings, layernorm, biases, affine params) unchanged.

The classification is by name + rank, mirroring how the HF modules are declared in
``modeling_vits.py``; ``TORCH_LAYOUT`` tags let :func:`to_torch_layout` invert the
conversion exactly for export.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

# Substrings identifying nn.Linear weights (the only 2-D weights that need a
# transpose; embeddings and elementwise-affine params keep their torch layout).
_LINEAR_MARKERS = (".k_proj.", ".v_proj.", ".q_proj.", ".out_proj.")
# ConvTranspose1d lives only in the HiFiGAN upsampler.
_CONVTRANSPOSE_MARKER = ".upsampler."


def classify(name: str, ndim: int) -> str:
    """Return one of {'linear','conv','conv_transpose','plain'} for a torch param."""
    if name.endswith(".weight"):
        if ndim == 3:
            if _CONVTRANSPOSE_MARKER in name:
                return "conv_transpose"
            return "conv"
        if ndim == 2 and any(m in name for m in _LINEAR_MARKERS):
            return "linear"
    return "plain"


def from_torch_layout(name: str, value: np.ndarray) -> np.ndarray:
    kind = classify(name, value.ndim)
    if kind == "linear":
        return np.ascontiguousarray(value.T)
    if kind == "conv":
        return np.ascontiguousarray(value.transpose(2, 1, 0))
    if kind == "conv_transpose":
        # torch weight W[in, out, k]; the equivalent regular conv (after input
        # dilation) uses kernel[t, i, o] = W[i, o, K-1-t].
        return np.ascontiguousarray(np.flip(value.transpose(2, 0, 1), axis=0))
    return np.ascontiguousarray(value)


def to_torch_layout(name: str, value: np.ndarray) -> np.ndarray:
    """Exact inverse of :func:`from_torch_layout` (for export/round-trip)."""
    kind = classify(name, value.ndim)
    if kind == "linear":
        return np.ascontiguousarray(value.T)
    if kind == "conv":
        return np.ascontiguousarray(value.transpose(2, 1, 0))
    if kind == "conv_transpose":
        return np.ascontiguousarray(np.flip(value, axis=0).transpose(1, 2, 0))
    return np.ascontiguousarray(value)


def convert_state_dict(
    state_dict: Mapping[str, np.ndarray], dtype=np.float32
) -> dict[str, np.ndarray]:
    """Convert a full torch-layout state dict (numpy values) to canonical layout."""
    out = {}
    for name, value in state_dict.items():
        arr = np.asarray(value)
        if arr.dtype == np.int8:
            # quantized weights stay int8 (ParamView dequantizes at access
            # via the sibling .scale row); casting would bake the raw
            # integer levels in as weights
            out[name] = from_torch_layout(name, arr)
            continue
        if arr.dtype in (np.float16, np.float64):
            arr = arr.astype(np.float32)
        out[name] = from_torch_layout(name, arr).astype(dtype, copy=False)
    return out


class ParamView:
    """Prefix-scoped read access to the flat param dict.

    The functional analogue of the reference's RAII prefix stack
    (``use("encoder.layers.0")`` / ``get("weight")``,
    /root/reference/src/vits_model_data.cpp:136-151).
    """

    __slots__ = ("_params", "_prefix")

    def __init__(self, params: Mapping[str, np.ndarray], prefix: str = ""):
        self._params = params
        self._prefix = prefix

    def sub(self, name: str) -> "ParamView":
        prefix = f"{self._prefix}{name}." if name else self._prefix
        return ParamView(self._params, prefix)

    def __getitem__(self, name: str):
        key = self._prefix + name
        try:
            value = self._params[key]
        except KeyError:
            raise KeyError(f"parameter not found: {key}") from None
        # Int8-quantized weights (vits_tpu.io.quantize) are stored alongside
        # per-out-channel ".scale" arrays; dequantize at access so quantized
        # param dicts are drop-ins everywhere (jit traces the multiply and XLA
        # fuses it into the consuming conv — weights stay int8 in HBM).
        if hasattr(value, "dtype") and value.dtype == "int8":
            scale = self._params.get(key + ".scale")
            if scale is not None:
                # Dequantize into the scale's dtype: the engine casts scales
                # to its compute dtype at load, so int8 weights follow the
                # fp32/bf16 policy without a second knob.
                return value.astype(scale.dtype) * scale.reshape(
                    (1,) * (value.ndim - 1) + (-1,)
                )
        return value

    def __contains__(self, name: str) -> bool:
        return (self._prefix + name) in self._params

    def get(self, name: str, default=None):
        return self._params.get(self._prefix + name, default)
