"""Worker process for the 2-process multi-host runtime integration test.

Launched by tests/test_runtime.py with:
    python tests/_runtime_worker.py <process_id> <num_processes> <port> [ckpt_dir]
Environment (set by the parent): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.

Prints: RESULT <process_id> <loss> <ccc>
and, when ckpt_dir is given (shared filesystem), after a save -> restore ->
step round trip through the shard-aware CheckpointManager:
        CKPT <process_id> <restored_step> <post_resume_loss>
"""

import sys


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_deer.core import metrics as metrics_lib
    from tpu_deer.data.pipeline import ArrayDataset, BatchIterator
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        create_complete_deer_model,
    )
    from tpu_deer.parallel.mesh import MeshConfig
    from tpu_deer.parallel.runtime import (
        RuntimeConfig,
        initialize_runtime,
        shutdown_runtime,
    )
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    rt = initialize_runtime(
        RuntimeConfig(
            coordinator_address=f"localhost:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
    )
    assert rt.process_count == num_processes, rt.process_count
    n_global = len(rt.global_devices)

    mesh = rt.global_mesh(MeshConfig(data=n_global))

    model_cfg = DEERModelConfig(
        audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
        attention_heads=4, encoder_layers=1, dropout=0.0,
    )
    model, params = create_complete_deer_model(model_cfg, seed=0)

    global_bs = 2 * n_global
    splits = make_synthetic_splits(
        SyntheticConfig(
            n_train=global_bs, n_val=0, n_test=0,
            audio_dim=16, video_dim=16, text_dim=16, seed=7,
        )
    )
    ds = ArrayDataset(splits["train"], "synthetic")
    it = BatchIterator(
        ds, global_bs, shuffle=False,
        process_index=rt.process_index, process_count=rt.process_count,
    )

    trainer = DEERTrainer(
        model, params,
        TrainingConfig(batch_size=global_bs, num_epochs=1, warmup_epochs=0,
                       scheduler="constant", seed=3),
        steps_per_epoch=1, mesh=mesh, runtime=rt,
    )

    import jax.numpy as jnp

    local_batch = next(iter(it.epoch(0)))
    sharded = trainer._put(local_batch)
    assert sharded["audio"].shape[0] == global_bs, sharded["audio"].shape

    state, aux = trainer._train_step(
        trainer.state, sharded, jnp.asarray(1.0), jnp.asarray(1.0)
    )
    loss = float(jax.device_get(aux["loss"]))

    # Distributed eval metrics ride the same global arrays.
    eval_out = trainer._eval_step(state.params, sharded)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_deer.parallel.dist_metrics import global_ccc_stats

    @jax.jit
    def dist_ccc(y_true, y_pred):
        def shard_fn(t, p):
            return metrics_lib.ccc_from_stats(
                global_ccc_stats(t, p, axis_name="data")
            )

        return shard_map(
            shard_fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )(y_true, y_pred)

    ccc = float(jax.device_get(dist_ccc(sharded["labels"], eval_out["mu"])))

    print(f"RESULT {process_id} {loss:.8f} {ccc:.8f}", flush=True)

    if ckpt_dir:
        # Multi-process shard-aware checkpoint: each process writes only its
        # own devices' shards (barrier-coordinated), then restores re-placed
        # on the global mesh and takes one more step.
        from tpu_deer.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        mgr.save(state, step=int(state.step))
        restored = mgr.restore(state)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            # Compare per-addressable-shard: works even when a leaf's global
            # array spans devices this process cannot read.
            for sa, sb in zip(a.addressable_shards, b.addressable_shards):
                np.testing.assert_array_equal(
                    np.asarray(sa.data), np.asarray(sb.data)
                )
        # Read the restored step BEFORE the train step: the jitted step
        # donates its state argument, deleting `restored`'s buffers.
        restored_step = int(jax.device_get(restored.step))
        state2, aux2 = trainer._train_step(
            restored, sharded, jnp.asarray(1.0), jnp.asarray(1.0)
        )
        loss2 = float(jax.device_get(aux2["loss"]))
        print(f"CKPT {process_id} {restored_step} {loss2:.8f}", flush=True)

    shutdown_runtime(rt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
