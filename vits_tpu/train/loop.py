"""Training loop driver: data -> sharded GAN steps -> checkpoints -> export.

Ties the training stack together (none of which exists in the reference):

    python -m vits_tpu.train.loop --corpus ./LJSpeech-1.1 --model mms-eng.ggml \
        --out ./run1 --steps 100000

Resumable (picks up the latest checkpoint in --out), data-parallel over the
device mesh, periodic .ggml export so trained weights drop straight into the
inference engine or the reference implementation.
"""

from __future__ import annotations

import time

import numpy as np


def train(
    corpus_dir: str,
    model_source: str,
    out_dir: str,
    steps: int = 100_000,
    batch_size: int = 16,
    learning_rate: float = 2e-4,
    disc_learning_rate: float | None = None,  # None = same as generator.
    #   A LOWER D lr is the standard rebalance when the discriminator
    #   saturates (disc_loss -> 0, adversarial gradient starves) — the
    #   round-2 convergence artifact showed exactly that on the synthetic
    #   micro-corpus.
    segment_frames: int = 32,
    checkpoint_every: int = 2000,
    log_every: int = 50,
    seed: int = 0,
    adversarial: bool = True,
    model_parallel: int = 1,
    grad_accum: int = 1,  # microbatches per optimizer update (lax.scan'd):
    #   activation memory of batch_size/grad_accum at full-batch statistics
    compute_dtype: str = "float32",  # "bfloat16": bf16 model math on the MXU,
    #   fp32 master params/optimizer/losses (train/step.py)
    zero1: bool = False,  # shard Adam moments over the 'data' axis (ZeRO-1):
    #   2x-param-bytes of optimizer state drop to 2x/dp per chip
    log=print,
    metrics_hook=None,
    stall_seconds: float = 600.0,
    stall_abort: bool = False,
):
    import jax
    import jax.numpy as jnp
    import optax

    from vits_tpu.io import loader
    from vits_tpu.models.discriminator import init_discriminator_params
    from vits_tpu.parallel.distributed import is_primary
    from vits_tpu.parallel.mesh import data_sharding, make_mesh, shard_params
    from vits_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from vits_tpu.train.data import Prefetcher, VitsDataset
    from vits_tpu.train.step import (
        TrainBatch,
        make_gan_train_step,
        make_train_step,
    )

    if model_source.endswith(".ggml"):
        config, tokenizer, gen_params = loader.load_ggml(model_source)
    else:
        config, tokenizer, gen_params = loader.load_hf_pretrained(
            model_source, keep_training=True
        )
    if "posterior_encoder.conv_pre.weight" not in gen_params:
        raise ValueError(
            "checkpoint lacks training-only modules (posterior encoder / SDP "
            "posterior flows); export with keep_training=True"
        )

    dataset = VitsDataset(corpus_dir, tokenizer, config)
    log(f"dataset: {len(dataset)} utterances")

    from vits_tpu.train.schedule import ParamEMA, vits_optimizer

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev // model_parallel, model=model_parallel)
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    gen_opt = vits_optimizer(learning_rate, steps_per_epoch=steps_per_epoch)
    disc_opt = vits_optimizer(
        disc_learning_rate if disc_learning_rate is not None else learning_rate,
        steps_per_epoch=steps_per_epoch,
    )
    ema = ParamEMA()

    with mesh:
        gen_params = shard_params(gen_params, mesh, model_parallel > 1)
        disc_params = shard_params(
            init_discriminator_params(seed), mesh, model_parallel=False
        )
        gen_opt_state = gen_opt.init(gen_params)
        disc_opt_state = disc_opt.init(disc_params)

        gen_opt_sh = disc_opt_sh = None
        if zero1:
            from vits_tpu.parallel.mesh import opt_state_shardings, shard_opt_state

            gen_opt_sh = opt_state_shardings(gen_opt_state, mesh)
            disc_opt_sh = opt_state_shardings(disc_opt_state, mesh)
            gen_opt_state = shard_opt_state(gen_opt_state, mesh)
            disc_opt_state = shard_opt_state(disc_opt_state, mesh)

        start_step = 0
        if latest_step(out_dir) is not None:
            restored = restore_checkpoint(
                out_dir,
                gen_opt_template=gen_opt_state,
                disc_opt_template=disc_opt_state,
            )
            gen_params = shard_params(restored["gen_params"], mesh, model_parallel > 1)
            if restored["disc_params"] is not None:
                disc_params = shard_params(restored["disc_params"], mesh, False)
            if restored["gen_opt_state"] is not None:
                gen_opt_state = restored["gen_opt_state"]
                if zero1:
                    gen_opt_state = shard_opt_state(gen_opt_state, mesh)
            if restored["disc_opt_state"] is not None:
                disc_opt_state = restored["disc_opt_state"]
                if zero1:
                    disc_opt_state = shard_opt_state(disc_opt_state, mesh)
            start_step = restored["step"]
            log(f"resumed from step {start_step}")

        if adversarial:
            step_fn = make_gan_train_step(
                config, gen_opt, disc_opt, segment_frames=segment_frames,
                grad_accum=grad_accum, compute_dtype=compute_dtype,
                gen_opt_shardings=gen_opt_sh, disc_opt_shardings=disc_opt_sh,
            )
        else:
            step_fn = make_train_step(
                config, gen_opt, segment_frames=segment_frames,
                grad_accum=grad_accum, compute_dtype=compute_dtype,
                opt_shardings=gen_opt_sh,
            )

        ema_params = ema.init(gen_params)
        if start_step:
            import os as _os

            ema_path = _os.path.join(
                out_dir, f"step_{start_step:08d}", "gen_params_ema.npz"
            )
            if _os.path.exists(ema_path):
                with np.load(ema_path) as data:
                    ema_params = {k: jnp.asarray(data[k]) for k in data.files}
                log("restored EMA weights")
        # jitted + donated: the eager tree_map dispatches hundreds of tiny
        # host-side ops per step otherwise.  The step index rides in as a
        # device scalar so the decay warmup doesn't retrace per step.
        ema_update = jax.jit(ema.update, donate_argnums=(0,))
        ds = data_sharding(mesh)
        dp = mesh.devices.shape[0]
        rng_np = np.random.default_rng(seed)
        batches = Prefetcher(dataset.batches(batch_size, rng_np))
        key = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()

        def pad_rows(batch: TrainBatch) -> TrainBatch:
            """Round the batch up to a multiple of the data-parallel degree.

            Padded rows are minimal dummy utterances (1 valid token, a few
            silent frames) — a fully-masked row would NaN the attention
            softmax; these contribute ~0 to the masked losses.
            """
            B = batch.input_ids.shape[0]
            target = ((B + dp - 1) // dp) * dp
            if target == B:
                return batch
            extra = target - B

            def pad(x, rows):
                return np.concatenate([x, rows], axis=0)

            tm = np.zeros((extra, batch.token_mask.shape[1]), np.float32)
            tm[:, 0] = 1.0
            fm = np.zeros((extra, batch.frame_mask.shape[1]), np.float32)
            fm[:, : max(segment_frames, 8)] = 1.0
            return TrainBatch(
                input_ids=pad(batch.input_ids, np.zeros((extra, batch.input_ids.shape[1]), np.int32)),
                token_mask=pad(batch.token_mask, tm),
                spectrogram=pad(batch.spectrogram, np.zeros((extra,) + batch.spectrogram.shape[1:], np.float32)),
                frame_mask=pad(batch.frame_mask, fm),
                audio=pad(batch.audio, np.zeros((extra, batch.audio.shape[1]), np.float32)),
                speaker_id=None if batch.speaker_id is None else pad(
                    batch.speaker_id, np.zeros((extra,), np.int32)
                ),
            )

        from vits_tpu.train.watchdog import Watchdog

        watchdog = Watchdog(
            out_dir, stall_seconds=stall_seconds,
            process_index=jax.process_index(), abort=stall_abort, log=log,
        )
        try:
            for step_idx, batch in zip(range(start_step + 1, steps + 1), batches):
                watchdog.beat(step_idx)
                key, sub = jax.random.split(key)
                batch = pad_rows(batch)
                batch = TrainBatch(*[
                    jax.device_put(x, ds) if x is not None else None for x in batch
                ])
                if adversarial:
                    gen_params, disc_params, gen_opt_state, disc_opt_state, metrics = step_fn(
                        gen_params, disc_params, gen_opt_state, disc_opt_state, batch, sub
                    )
                else:
                    gen_params, gen_opt_state, metrics = step_fn(
                        gen_params, gen_opt_state, batch, sub
                    )

                ema_params = ema_update(
                    ema_params, gen_params, jnp.asarray(step_idx - 1, jnp.int32)
                )

                if step_idx % log_every == 0 and is_primary():
                    metrics = jax.device_get(metrics)
                    rate = log_every / (time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    fields = " ".join(
                        f"{k}={float(v):.3f}" for k, v in metrics._asdict().items()
                    )
                    log(f"step {step_idx}: {fields} ({rate:.2f} it/s)")
                    if metrics_hook is not None:
                        metrics_hook(
                            step_idx,
                            {k: float(v) for k, v in metrics._asdict().items()},
                            rate,
                        )

                if (step_idx % checkpoint_every == 0 or step_idx == steps) and is_primary():
                    # Single-writer: only process 0 touches the checkpoint dir —
                    # concurrent writers from other hosts would corrupt it.
                    import os as _os

                    ckpt_dir = save_checkpoint(
                        out_dir, step_idx,
                        jax.device_get(gen_params),
                        jax.device_get(gen_opt_state),
                        jax.device_get(disc_params) if adversarial else None,
                        jax.device_get(disc_opt_state) if adversarial else None,
                        metadata={"batch_size": batch_size, "lr": learning_rate},
                    )
                    # EMA weights alongside (the preferred serving weights)
                    np.savez(
                        _os.path.join(ckpt_dir, "gen_params_ema.npz"),
                        **{k: np.asarray(v) for k, v in jax.device_get(ema_params).items()},
                    )
                    log(f"checkpointed step {step_idx}")

        finally:
            # Stop the stall watchdog BEFORE teardown (it force-exits the
            # process on a heartbeat gap — checkpoint writes during an
            # exception unwind must not race it) and release the prefetch
            # thread, which otherwise stays blocked on the full queue for
            # the life of the process (one leaked thread per train() call).
            watchdog.stop()
            batches.close()

    return gen_params


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--model", required=True, help=".ggml (keep_training) or HF name")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--no-gan", action="store_true")
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatches per optimizer update")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="model compute dtype (master params stay fp32)")
    ap.add_argument("--zero1", action="store_true",
                    help="shard optimizer moments over the data axis (ZeRO-1)")
    args = ap.parse_args(argv)
    train(
        args.corpus, args.model, args.out,
        steps=args.steps, batch_size=args.batch_size, learning_rate=args.lr,
        adversarial=not args.no_gan, model_parallel=args.model_parallel,
        grad_accum=args.grad_accum, compute_dtype=args.dtype, zero1=args.zero1,
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
