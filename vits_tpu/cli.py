"""Command-line synthesis — the reference CLI rebuilt
(/root/reference/test/main.cpp: load model, synthesize phrase, write WAV),
plus flags the reference lacks (it ignores argv entirely, main.cpp:67).

    python -m vits_tpu.cli --model scripts/vits-spanish.ggml \
        --text "Cada amanecer trae consigo nuevas oportunidades" --out output.wav
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vits_tpu", description=__doc__)
    parser.add_argument("--model", required=True, help=".ggml path or HF model dir/name")
    parser.add_argument("--text", action="append",
                        help="text to synthesize (repeatable for batch)")
    parser.add_argument("--convert", metavar="WAV",
                        help="voice conversion: re-synthesize this WAV in the "
                             "--speaker-id voice (use --source-speaker for "
                             "multi-speaker checkpoints)")
    parser.add_argument("--source-speaker", type=int, default=None,
                        help="speaker the --convert audio was spoken by")
    parser.add_argument("--out", default="output.wav", help="output WAV path (or prefix for batches)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--speaker-id", type=int, default=None)
    parser.add_argument("--noise-scale", type=float, default=None,
                        help="prior noise scale (default: checkpoint config)")
    parser.add_argument("--noise-scale-duration", type=float, default=None,
                        help="duration-predictor noise scale")
    parser.add_argument("--speaking-rate", type=float, default=None,
                        help=">1 = faster speech, <1 = slower")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    parser.add_argument("--fidelity",
                        choices=["fast", "glue32", "high", "exact"],
                        default="fast",
                        help="precision tier (EngineConfig.fidelity_kwargs): "
                             "fast = bf16 multiplies/values (default); "
                             "glue32 = fp32-exact encoder/duration/flow "
                             "(pins frame alignment to fp32 semantics); "
                             "high = 3-pass bf16x3 vocoder multiplies "
                             "(measured mel-L1 2.9e-4 — under the 1e-3 "
                             "target at ~half the exact cost); "
                             "exact = fp32-exact end-to-end (mel-L1 3.6e-5 "
                             "vs the fp32 oracle on trained weights)")
    parser.add_argument("--bench", type=int, default=0, metavar="N",
                        help="after synthesis, time N repeat runs (bench_e2e.cpp behavior)")
    parser.add_argument("--stream", action="store_true",
                        help="chunked streaming decode (prints per-chunk TTFA)")
    parser.add_argument("--sp", type=int, default=0, metavar="N",
                        help="shard each utterance's flow+vocoder over N "
                             "chips (time-axis sharding; sample-exact, cuts "
                             "single-utterance latency ~Nx)")
    parser.add_argument("--long", action="store_true", dest="longform",
                        help="split long text at sentences, batch, and stitch")
    parser.add_argument("--compilation-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache: repeat CLI "
                             "invocations reuse compiled programs instead of "
                             "recompiling (one-shot runs benefit most)")
    args = parser.parse_args(argv)
    if not args.text and not args.convert:
        parser.error("provide --text (synthesis) or --convert (voice conversion)")

    import vits_tpu
    from vits_tpu.config import EngineConfig
    from vits_tpu.utils.wav import write_wav

    model = vits_tpu.load_model(args.model, EngineConfig(
        compute_dtype=args.dtype,
        compilation_cache_dir=args.compilation_cache,
        **EngineConfig.fidelity_kwargs(args.fidelity)))
    controls = dict(
        noise_scale=args.noise_scale,
        noise_scale_duration=args.noise_scale_duration,
        speaking_rate=args.speaking_rate,
    )
    t0 = time.perf_counter()
    if args.convert:
        from vits_tpu.utils.wav import read_wav

        audio, in_rate = read_wav(args.convert)
        if in_rate != model.config.sampling_rate:
            print(f"error: {args.convert} is {in_rate} Hz; the checkpoint "
                  f"expects {model.config.sampling_rate} Hz", file=sys.stderr)
            return 1
        waves = [model.convert_voice(
            audio, source_speaker=args.source_speaker,
            target_speaker=args.speaker_id, seed=args.seed,
            noise_scale=args.noise_scale or 0.0,
        )]
    elif args.stream:
        import numpy as np

        from vits_tpu.engine.streaming import StreamingDecoder

        stream = StreamingDecoder(model)
        waves = []
        for text in args.text:
            chunks = []
            for i, chunk in enumerate(
                stream.stream(text, seed=args.seed, speaker_id=args.speaker_id,
                              **controls)
            ):
                if i == 0 and not waves:
                    print(f"TTFA: {(time.perf_counter() - t0) * 1000:.1f} ms")
                chunks.append(chunk)
            waves.append(np.concatenate(chunks))
    elif args.longform:
        from vits_tpu.engine.longform import synthesize_long

        waves = [synthesize_long(model, " ".join(args.text), seed=args.seed,
                                 speaker_id=args.speaker_id, **controls)]
    elif args.sp > 1:
        from vits_tpu.engine.sp import ShardedDecoder
        from vits_tpu.parallel.mesh import make_mesh

        import jax

        sp = ShardedDecoder(
            model, mesh=make_mesh(data=args.sp, model=1,
                                  devices=jax.devices()[: args.sp]))
        waves = [sp.synthesize(t, seed=args.seed, speaker_id=args.speaker_id,
                               **controls) for t in args.text]
    else:
        waves = model.synthesize(list(args.text), seed=args.seed,
                                 speaker_id=args.speaker_id, **controls)
    t1 = time.perf_counter()

    rate = model.config.sampling_rate
    outs = []
    if len(waves) == 1:
        write_wav(args.out, waves[0], rate)
        outs.append(args.out)
    else:
        stem = args.out[:-4] if args.out.endswith(".wav") else args.out
        for i, w in enumerate(waves):
            path = f"{stem}_{i}.wav"
            write_wav(path, w, rate)
            outs.append(path)
    audio_sec = sum(len(w) for w in waves) / rate
    print(
        f"Synthesized {audio_sec:.2f}s of audio in {t1 - t0:.3f}s "
        f"(incl. compile) -> {', '.join(outs)}"
    )

    if args.bench and args.text:
        times = []
        for _ in range(args.bench):
            t0 = time.perf_counter()
            model.synthesize(list(args.text), seed=args.seed,
                             speaker_id=args.speaker_id, **controls)
            times.append(time.perf_counter() - t0)
        avg = sum(times) / len(times)
        print(f"Average time: {avg * 1000:.2f} ms over {args.bench} runs "
              f"({audio_sec / avg:.1f}x real-time)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
