"""Subprocess worker for the elastic-recovery integration test.

Spawned by tests/test_elastic_recovery.py as two real OS processes joined via
``jax.distributed`` (the closest a single machine gets to a multi-host TPU
pod).  Each worker runs a REAL data-parallel generator training loop with the
production liveness/recovery pieces wired together the way a pod deployment
would run them:

  * ``train.watchdog.Watchdog(abort=True)`` — heartbeat per step; if a peer
    dies/stalls, the hung collective trips the watchdog, which force-exits
    with code 42 so a supervisor restarts the job (the reference has nothing
    here: failure = ASSERT + exit, /root/reference/src/include/debug.h:29-36);
  * single-writer ``train.checkpoint.save_checkpoint`` every K steps;
  * on startup, ``restore_checkpoint`` resumes from the latest step if one
    exists (params AND optimizer state), so the restarted job continues the
    same trajectory.

Batches and RNG are keyed by the global step, so a resumed run recomputes
bit-identical steps — the test asserts loss continuity across the kill.

Usage: elastic_worker.py <pid> <nprocs> <port> <run_dir> <fixture>
                         <total_steps> <checkpoint_every> <stall_seconds>
                         <step_delay> <tag>
"""

import json
import os
import sys


def main() -> int:
    (pid, nprocs, port, run_dir, fixture, total_steps, checkpoint_every,
     stall_seconds, step_delay, tag) = sys.argv[1:11]
    pid, nprocs = int(pid), int(nprocs)
    total_steps, checkpoint_every = int(total_steps), int(checkpoint_every)
    stall_seconds, step_delay = float(stall_seconds), float(step_delay)

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vits_tpu.parallel import distributed

    # Keep JAX's own coordination-service failure detector (default 100 s)
    # BEHIND the training watchdog, so the test exercises the watchdog path
    # deterministically instead of racing the two detectors.
    distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nprocs,
        process_id=pid,
        heartbeat_timeout_seconds=max(int(stall_seconds * 5), 600),
    )

    import time

    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from vits_tpu.io import loader
    from vits_tpu.parallel.mesh import shard_params
    from vits_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                           save_checkpoint)
    from vits_tpu.train.step import TrainBatch, make_train_step
    from vits_tpu.train.watchdog import Watchdog

    config, _, params = loader.load_ggml(fixture)
    mesh = distributed.global_mesh()
    opt = optax.adamw(2e-4)

    T, S, B_local = 12, 24, 2
    up = config.total_upsample

    def batch_for(step: int) -> TrainBatch:
        # Deterministic per (step, host): a resumed run re-feeds the same data.
        rng = np.random.default_rng(1000 * step + pid)
        local = TrainBatch(
            input_ids=rng.integers(0, config.vocab_size, (B_local, T)).astype(np.int32),
            token_mask=np.ones((B_local, T), np.float32),
            spectrogram=rng.standard_normal(
                (B_local, S, config.spectrogram_bins)).astype(np.float32),
            frame_mask=np.ones((B_local, S), np.float32),
            audio=(rng.standard_normal((B_local, S * up)) * 0.1).astype(np.float32),
        )
        return TrainBatch(*[
            None if x is None
            else multihost_utils.host_local_array_to_global_array(x, mesh, P("data"))
            for x in local
        ])

    losses: dict[str, float] = {}
    loss_path = os.path.join(run_dir, f"losses-{pid}-{tag}.json")

    with mesh:
        params = shard_params(params, mesh, model_parallel=False)
        opt_state = opt.init(params)
        start_step, resumed_from = 0, None
        if latest_step(run_dir) is not None:
            ck = restore_checkpoint(run_dir, gen_opt_template=opt_state)
            params = shard_params(ck["gen_params"], mesh, model_parallel=False)
            replicate = NamedSharding(mesh, P())
            opt_state = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, replicate), ck["gen_opt_state"])
            start_step = resumed_from = ck["step"]

        step_fn = make_train_step(
            config, opt, segment_frames=8,
            mel_kwargs={"n_fft": 256, "hop_length": 64, "n_mels": 20},
            donate=False,
        )

        wd = None  # started after the first (compiling) step so compile
        #            latency can't trip the stall monitor
        for s in range(start_step + 1, total_steps + 1):
            batch = batch_for(s)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, jax.random.PRNGKey(s))
            loss = float(jax.device_get(metrics.loss))
            losses[str(s)] = loss
            with open(loss_path + ".tmp", "w") as fh:
                json.dump(losses, fh)
            os.replace(loss_path + ".tmp", loss_path)
            if wd is None:
                wd = Watchdog(run_dir, stall_seconds=stall_seconds,
                              process_index=pid, abort=True)
            wd.beat(s)
            if distributed.is_primary() and s % checkpoint_every == 0:
                save_checkpoint(run_dir, s, jax.device_get(params),
                                gen_opt_state=jax.device_get(opt_state),
                                metadata={"loss": loss})
            if step_delay:
                time.sleep(step_delay)
        if wd is not None:
            wd.stop()

    with open(os.path.join(run_dir, f"final-{pid}-{tag}.json"), "w") as fh:
        json.dump({"pid": pid, "resumed_from": resumed_from,
                   "final_step": total_steps, "losses": losses}, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
