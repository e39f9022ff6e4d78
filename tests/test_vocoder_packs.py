"""Load-time vocoder weight packs: formats, coverage, and HBM byte accounting.

Round 2 shipped fp32 packed shift matrices that are strictly LARGER than the
raw conv weights, so the default TPU path paid MORE weight HBM traffic than
XLA fp32 — and the int8 serving win evaporated on the pallas path.  Round 3
packs in bf16/int8 (kernels dequantize on the fp32 accumulator); these tests
pin the formats and the byte ledger.
"""

import numpy as np
import pytest

from vits_tpu.config import VitsConfig
from vits_tpu.io.random_init import random_params
from vits_tpu.models.hifigan import PACK_PREFIX, precompute_vocoder_packs


@pytest.fixture(scope="module")
def mixed_stage_model():
    """A config with one WIDE stage (256->128: trio pack) and one NARROW
    stage-fusable stage (128->64, rate 2: shift-matrix pack)."""
    config = VitsConfig(
        upsample_initial_channel=256,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    params = random_params(config, seed=0, keep_training=False)
    return config, params


def _pack_bytes(packs):
    return sum(
        np.asarray(v).nbytes for k, v in packs.items()
        if k.split(".")[-1] in ("wu", "w1_all", "w2_all", "wr_all", "wq", "w1", "w2")
    )


def test_pack_coverage(mixed_stage_model):
    config, params = mixed_stage_model
    packs = precompute_vocoder_packs(params, config)
    # stage 0 is wide -> trio packs for both resblocks
    assert f"{PACK_PREFIX}.0.rb0.w1" in packs
    assert f"{PACK_PREFIX}.0.rb1.w2" in packs
    # stage 1 is narrow + terminal -> shift-matrix pack incl. fused conv_post
    assert f"{PACK_PREFIX}.1.wu" in packs
    assert f"{PACK_PREFIX}.1.wq" in packs


def test_pack_formats_and_bytes(mixed_stage_model):
    config, params = mixed_stage_model
    f32 = precompute_vocoder_packs(params, config, weight_format="float32")
    bf16 = precompute_vocoder_packs(params, config, weight_format="bfloat16")
    int8 = precompute_vocoder_packs(params, config, weight_format="int8")

    assert str(bf16[f"{PACK_PREFIX}.1.wu"].dtype) == "bfloat16"
    assert str(bf16[f"{PACK_PREFIX}.0.rb0.w1"].dtype) == "bfloat16"
    assert str(int8[f"{PACK_PREFIX}.1.wu"].dtype) == "int8"
    assert str(int8[f"{PACK_PREFIX}.0.rb0.w1"].dtype) == "int8"
    # int8 packs carry the accumulator scale rows
    assert f"{PACK_PREFIX}.1.su" in int8 and f"{PACK_PREFIX}.1.s1" in int8
    assert f"{PACK_PREFIX}.0.rb0.s1" in int8 and f"{PACK_PREFIX}.0.rb0.s2" in int8
    # biases stay fp32 in every format
    assert str(int8[f"{PACK_PREFIX}.1.b1_all"].dtype) == "float32"

    b_f32, b_bf16, b_int8 = map(_pack_bytes, (f32, bf16, int8))
    assert b_bf16 == b_f32 // 2
    # wr (identity permutations) stays bf16 in the int8 format, so the ratio
    # is slightly above 1/4 — but far below the fp32 ledger round 2 shipped.
    assert b_int8 < b_f32 // 3


def test_unknown_format_rejected(mixed_stage_model):
    config, params = mixed_stage_model
    with pytest.raises(ValueError):
        precompute_vocoder_packs(params, config, weight_format="fp8")
