"""Subprocess worker for the multi-process distributed test.

Spawned by tests/test_distributed.py as N real OS processes, each with 2
virtual CPU devices, joined through ``jax.distributed`` (Gloo collectives) —
the closest a single machine gets to a multi-host TPU pod.  Runs one real
data-parallel generator train step over the GLOBAL mesh and exercises the
single-writer checkpoint gating (``is_primary``).

Usage: python multiproc_worker.py <pid> <nprocs> <port> <out_dir> <fixture>
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, out_dir, fixture = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vits_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
    )

    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from vits_tpu.io import loader
    from vits_tpu.parallel.mesh import shard_params
    from vits_tpu.train.step import TrainBatch, make_train_step

    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nprocs

    config, _, params = loader.load_ggml(fixture)
    mesh = distributed.global_mesh()  # ('data', 'model') over ALL processes

    T, S, B_local = 12, 24, 2
    up = config.total_upsample
    rng = np.random.default_rng(100 + pid)  # each host feeds its own shard
    local = TrainBatch(
        input_ids=rng.integers(0, config.vocab_size, (B_local, T)).astype(np.int32),
        token_mask=np.ones((B_local, T), np.float32),
        spectrogram=rng.standard_normal((B_local, S, config.spectrogram_bins)).astype(
            np.float32
        ),
        frame_mask=np.ones((B_local, S), np.float32),
        audio=(rng.standard_normal((B_local, S * up)) * 0.1).astype(np.float32),
    )

    with mesh:
        params = shard_params(params, mesh, model_parallel=False)
        opt = optax.adamw(2e-4)
        opt_state = opt.init(params)
        step = make_train_step(
            config,
            opt,
            segment_frames=8,
            mel_kwargs={"n_fft": 256, "hop_length": 64, "n_mels": 20},
            donate=False,
        )
        batch = TrainBatch(
            *[
                None
                if x is None
                else multihost_utils.host_local_array_to_global_array(x, mesh, P("data"))
                for x in local
            ]
        )
        params, opt_state, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
        loss = float(jax.device_get(metrics.loss))

    # Single-writer discipline (what train/loop.py does for checkpoints).
    primary = distributed.is_primary()
    if primary:
        with open(os.path.join(out_dir, "checkpoint_marker"), "x") as fh:
            fh.write(f"written by process {pid}\n")

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as fh:
        json.dump({"pid": pid, "loss": loss, "primary": primary}, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
