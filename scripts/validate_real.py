"""One-command real-checkpoint validation (run in any NETWORKED environment).

This build environment has no network egress, so every numerical oracle in
tests/ is a random-weight HF model (BASELINE.md).  The reference, by contrast,
ships real MMS exports and a real-weights functional golden
(predicted_length == 73 for the demo phrase under its RNG,
/root/reference/src/vits.cpp:1135-1136).  This script closes that gap
mechanically the first time it runs somewhere with network (or a populated HF
cache):

    python scripts/validate_real.py [--model facebook/mms-tts-eng] [--out ./real]

It (1) downloads the real checkpoint, (2) runs the HF torch pipeline with
recorded noise, (3) runs this repo's JAX pipeline with the SAME noise injected
via NoiseOverride, (4) reports waveform-L1 / mel-L1 / length agreement,
(5) round-trips the weights through our .ggml writer+reader and re-checks,
and (6) records the deterministic (zero-noise) predicted frame count for the
reference demo phrase as the repo's own functional golden.

Exit code 0 = all checks passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# the reference CLI's demo phrase (/root/reference/test/main.cpp:64)
DEMO_PHRASE = "Cada amanecer trae consigo nuevas oportunidades para crecer y aprender"


def record_torch_noise(seed: int = 0):
    """Patch torch.randn/randn_like to a fixed stream, recording each draw."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    recorded: list = []
    orig_randn = torch.randn

    def fake_randn(*size, **kwargs):
        if size and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        kwargs.pop("generator", None)
        device = kwargs.pop("device", None)
        dtype = kwargs.pop("dtype", None)
        t = orig_randn(*size, generator=gen)
        if dtype is not None:
            t = t.to(dtype)
        if device is not None:
            t = t.to(device)
        recorded.append(t.clone())
        return t

    def fake_randn_like(input, **kwargs):
        return fake_randn(*input.shape)

    torch.randn = fake_randn
    torch.randn_like = fake_randn_like
    return recorded, (orig_randn,)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="facebook/mms-tts-eng")
    ap.add_argument("--text", default="Every dawn brings new opportunities to grow and learn")
    ap.add_argument("--out", default="./real_validation")
    ap.add_argument("--atol-wave", type=float, default=5e-4)
    ap.add_argument("--atol-mel", type=float, default=1e-3)
    args = ap.parse_args(argv)

    import torch
    from transformers import AutoTokenizer, VitsModel

    from vits_tpu.io.loader import export_to_ggml, load_ggml, load_hf_module
    from vits_tpu.models.vits import NoiseOverride, synthesize
    from vits_tpu.utils.mel import log_mel_spectrogram
    from vits_tpu.utils.wav import write_wav

    os.makedirs(args.out, exist_ok=True)
    report: dict = {"model": args.model, "text": args.text, "checks": {}}

    print(f"loading {args.model} (network or HF cache required)...", flush=True)
    try:
        hf_model = VitsModel.from_pretrained(args.model)
    except OSError as exc:
        print(f"BLOCKED: cannot fetch {args.model} — no network/HF cache in "
              f"this environment ({type(exc).__name__}). This closer runs on "
              f"first contact with a networked environment (VERDICT item: "
              f"real-checkpoint validation).", flush=True)
        return 2
    hf_model.eval()
    hf_tok = AutoTokenizer.from_pretrained(args.model)

    config, tokenizer, params = load_hf_module(hf_model, hf_tok, keep_training=False)

    enc = hf_tok(args.text, return_tensors="pt")
    ids = enc["input_ids"].numpy().astype(np.int32)
    mask = enc["attention_mask"].numpy().astype(np.float32)

    # --- HF forward with recorded noise ---------------------------------- #
    recorded, _ = record_torch_noise(seed=0)
    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    hf_wave = hf_out.waveform.numpy()
    hf_len = int(hf_out.sequence_lengths[0])

    # --- our forward with the SAME noise ---------------------------------- #
    dur = recorded[0].numpy().transpose(0, 2, 1)  # HF draws (B, 2, T) first
    prior_hf = recorded[1].numpy().transpose(0, 2, 1)
    frames_hf = prior_hf.shape[1]
    num_frames = int(np.ceil(frames_hf / 64)) * 64
    prior = np.zeros((1, num_frames, config.flow_size), np.float32)
    prior[:, :frames_hf] = prior_hf
    noise = NoiseOverride(
        duration=dur.astype(np.float32), prior=prior.astype(np.float32)
    )
    out = synthesize(params, config, ids, mask, num_frames, noise=noise)
    ours = np.asarray(out.waveform)[0, :hf_len]
    ref = hf_wave[0, :hf_len]

    wave_l1 = float(np.abs(ours - ref).mean())
    mel_ours = np.asarray(log_mel_spectrogram(ours[None], sample_rate=config.sampling_rate))
    mel_ref = np.asarray(log_mel_spectrogram(ref[None], sample_rate=config.sampling_rate))
    mel_l1 = float(np.abs(mel_ours - mel_ref).mean())
    len_match = int(out.lengths[0]) == hf_len
    report["checks"]["waveform_l1"] = wave_l1
    report["checks"]["mel_l1"] = mel_l1
    report["checks"]["length_match"] = len_match
    print(f"waveform L1 vs HF: {wave_l1:.2e}  mel L1: {mel_l1:.2e}  "
          f"length match: {len_match}", flush=True)
    write_wav(os.path.join(args.out, "real_ours.wav"), ours, config.sampling_rate)
    write_wav(os.path.join(args.out, "real_hf.wav"), ref, config.sampling_rate)

    # --- .ggml round-trip with real weights ------------------------------- #
    ggml_path = os.path.join(args.out, "real.ggml")
    export_to_ggml(ggml_path, config, tokenizer, params)
    config2, _, params2 = load_ggml(ggml_path)
    out2 = synthesize(params2, config2, ids, mask, num_frames, noise=noise)
    rt_l1 = float(np.abs(np.asarray(out2.waveform)[0, :hf_len] - ours).mean())
    report["checks"]["ggml_roundtrip_l1"] = rt_l1
    # fp16 conv casts in the export bound this away from zero
    print(f".ggml round-trip waveform L1: {rt_l1:.2e}", flush=True)

    # --- deterministic functional golden (the repo's own '73') ------------ #
    enc2 = hf_tok(DEMO_PHRASE, return_tensors="pt")
    ids2 = enc2["input_ids"].numpy().astype(np.int32)
    mask2 = enc2["attention_mask"].numpy().astype(np.float32)
    zero = NoiseOverride(
        duration=np.zeros((1, ids2.shape[1], 2), np.float32),
        prior=np.zeros((1, 1024, config.flow_size), np.float32),
    )
    out3 = synthesize(params, config, ids2, mask2, 1024, noise=zero)
    golden_frames = int(out3.frame_lengths[0])
    report["checks"]["demo_phrase_frames_zero_noise"] = golden_frames
    print(f"demo-phrase deterministic frames: {golden_frames} "
          f"(record this as the functional golden)", flush=True)

    ok = wave_l1 < args.atol_wave and mel_l1 < args.atol_mel and len_match
    report["passed"] = bool(ok)
    with open(os.path.join(args.out, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
