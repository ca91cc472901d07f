"""Shard-aware distributed checkpointing (train/checkpoint.py, round-3
VERDICT task 2): mesh-sharded state must save without a full host gather and
restore re-placed per the template's sharding — including across layouts.

Runs on the conftest's 8-device virtual CPU backend. The reference's ghost
`ModelCheckpoint` API (src/training/training.py:414-419) never existed at
all; this is its multi-chip-scale replacement.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_deer.parallel.mesh import MeshConfig, create_mesh, shard_params
from tpu_deer.train.checkpoint import CheckpointManager


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _params(rng=None, d=16):
    rng = rng or np.random.default_rng(0)
    # "input_proj" matches the TP sharding tag in parallel/mesh.py's
    # param_sharding_rules, so mode="tp" actually shards a kernel here.
    return {
        "input_proj": {
            "kernel": jnp.asarray(rng.standard_normal((d, 2 * d)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(2 * d), jnp.float32),
        },
        "head": {
            "kernel": jnp.asarray(rng.standard_normal((2 * d, 3)), jnp.float32),
        },
    }


@pytest.fixture(scope="module")
def mesh():
    n = len(jax.devices())
    return create_mesh(MeshConfig(data=n // 2, model=2))


class TestShardedSaveRestore:
    def test_fsdp_round_trip_bitwise(self, tmp_path, mesh):
        params = shard_params(_params(), mesh, mode="fsdp")
        state = {"params": params, "step": 7}
        mgr = CheckpointManager(str(tmp_path))
        path = mgr.save(state, step=7, metrics={"ccc": 0.5})
        # sharded layout, not a msgpack gather
        assert os.path.exists(os.path.join(path, "manifest.json"))
        assert not os.path.exists(os.path.join(path, "state.msgpack"))
        assert mgr.metadata(7)["format"] == "sharded"

        template = {"params": shard_params(_params(np.random.default_rng(9)),
                                           mesh, mode="fsdp"), "step": 0}
        restored = mgr.restore(template, step=7)
        _tree_equal(restored["params"], params)
        assert restored["step"] == 7
        # restored leaves carry the template's sharding
        k = restored["params"]["input_proj"]["kernel"]
        assert "data" in (k.sharding.spec or ())

    def test_cross_layout_restore(self, tmp_path, mesh):
        """Save under FSDP, restore under TP — the chunks reassemble."""
        params = shard_params(_params(), mesh, mode="fsdp")
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({"params": params}, step=1)
        template = {
            "params": shard_params(_params(np.random.default_rng(3)), mesh,
                                   mode="tp")
        }
        restored = mgr.restore(template, step=1)
        _tree_equal(restored["params"], params)
        specs = {
            str(leaf.sharding.spec)
            for leaf in jax.tree_util.tree_leaves(restored["params"])
        }
        assert any("model" in s for s in specs), specs

    def test_restore_to_host_template(self, tmp_path, mesh):
        params = shard_params(_params(), mesh, mode="fsdp")
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({"params": params}, step=1)
        host_template = {"params": jax.tree_util.tree_map(np.asarray, _params())}
        restored = mgr.restore(host_template, step=1)
        _tree_equal(restored["params"], params)

    def test_restore_params_from_sharded(self, tmp_path, mesh):
        params = shard_params(_params(), mesh, mode="fsdp")
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({"params": params, "opt": {"mu": params}}, step=2)
        restored = mgr.restore_params(_params(np.random.default_rng(4)))
        _tree_equal(restored, params)

    def test_unmeshed_scalar_leaves_restore_uncommitted(self, tmp_path, mesh):
        """Regression (r4): a state mixing mesh-placed params with unmeshed
        single-device leaves (optax's `count` scalar from optimizer.init) must
        restore so that a jit over the whole state still compiles — the
        chunked restore may NOT commit the scalar to its one template device
        while params are committed to the mesh ("incompatible devices")."""
        params = shard_params(_params(), mesh, mode="fsdp")
        count = jnp.zeros((), jnp.int32)  # uncommitted, default device
        state = {"params": params, "count": count}
        mgr = CheckpointManager(str(tmp_path))
        path = mgr.save(state, step=3)
        assert os.path.exists(os.path.join(path, "manifest.json"))
        restored = mgr.restore(state, step=3)
        _tree_equal(restored["params"], params)
        assert int(np.asarray(restored["count"])) == 0
        # The mixed-placement jit that motivated the fix must run.
        out = jax.jit(
            lambda s: s["params"]["input_proj"]["bias"].sum()
            + s["count"].astype(jnp.float32)
        )(restored)
        assert np.isfinite(float(out))

    def test_no_duplicate_chunks_for_replicated_leaves(self, tmp_path, mesh):
        """A replicated leaf (bias under FSDP rules may stay replicated) is
        written once, not once per device."""
        sharding = NamedSharding(mesh, P())
        v = jax.device_put(jnp.arange(8, dtype=jnp.float32), sharding)
        w = jax.device_put(
            jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
            NamedSharding(mesh, P("data")),
        )
        mgr = CheckpointManager(str(tmp_path))
        path = mgr.save({"v": v, "w": w}, step=1)
        files = os.listdir(os.path.join(path, "arrays"))
        assert sum(f.startswith("v__") for f in files) == 1
        # w: one chunk per distinct data-axis shard
        assert sum(f.startswith("w__") for f in files) == mesh.shape["data"]

    def test_best_and_prune_work_sharded(self, tmp_path, mesh):
        params = shard_params(_params(), mesh, mode="fsdp")
        mgr = CheckpointManager(str(tmp_path), keep_last=2)
        for s in (1, 2, 3):
            mgr.save({"params": params, "step": s}, step=s, is_best=(s == 2))
        assert mgr.all_steps() == [2, 3]
        best = mgr.restore({"params": params, "step": 0}, step="best")
        assert best["step"] == 2

    def test_missing_leaf_is_loud(self, tmp_path, mesh):
        params = shard_params(_params(), mesh, mode="fsdp")
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({"params": params}, step=1)
        bad_template = {"params": params, "extra": jnp.zeros(3)}
        with pytest.raises(ValueError, match="lacks template leaves"):
            mgr.restore(bad_template, step=1)

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_mesh_placed_replicated_uses_chunked(self, tmp_path, n_dev):
        """A small mesh can leave every leaf of a tp/fsdp layout fully
        replicated; the format must key off mesh PLACEMENT, not whether any
        leaf happens to be sharded — otherwise the format flips with mesh
        size (round-3 regression: dryrun_multichip(2) asserted manifest.json
        while only the 8-device run produced it)."""
        mesh = create_mesh(
            MeshConfig(data=n_dev, model=1), devices=jax.devices()[:n_dev]
        )
        params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), _params()
        )
        state = {"params": params, "step": 3}
        mgr = CheckpointManager(str(tmp_path))
        path = mgr.save(state, step=3)
        assert os.path.exists(os.path.join(path, "manifest.json"))
        assert not os.path.exists(os.path.join(path, "state.msgpack"))
        restored = mgr.restore(state, step=3)
        _tree_equal(restored["params"], params)
        assert restored["step"] == 3

    def test_replicated_state_still_msgpack(self, tmp_path):
        """Back-compat: plain single-host state keeps the msgpack format
        (existing artifacts / serving flows read it)."""
        state = {"params": jax.tree_util.tree_map(np.asarray, _params())}
        mgr = CheckpointManager(str(tmp_path))
        path = mgr.save(state, step=1)
        assert os.path.exists(os.path.join(path, "state.msgpack"))
        restored = mgr.restore(state, step=1)
        _tree_equal(restored, state)


class TestShardedTrainerRoundTrip:
    def test_fsdp_train_save_restore_train(self, tmp_path, mesh):
        """step -> save -> restore -> step under FSDP: restored state is
        bitwise-equal and the next step runs (the dryrun_multichip scenario,
        pinned here so CI catches regressions without the driver)."""
        from tpu_deer.data.pipeline import ArrayDataset, BatchIterator
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
        from tpu_deer.models.deer_model import (
            DEERModelConfig,
            create_complete_deer_model,
        )
        from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

        n = len(jax.devices())
        cfg = DEERModelConfig(
            audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
            fusion_dim=32, attention_heads=4, encoder_layers=1, dropout=0.0,
        )
        model, params = create_complete_deer_model(cfg, seed=0)
        bs = 2 * n
        splits = make_synthetic_splits(SyntheticConfig(
            n_train=bs, n_val=0, n_test=0, audio_dim=8, video_dim=8,
            text_dim=8,
        ))
        ds = ArrayDataset(splits["train"], "s")
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(batch_size=bs, num_epochs=1, warmup_epochs=0,
                           scheduler="constant", param_sharding="fsdp"),
            steps_per_epoch=1, mesh=mesh,
        )
        batch = trainer._put(next(iter(
            BatchIterator(ds, bs, shuffle=False).epoch(0)
        )))
        state1, _ = trainer._train_step(
            trainer.state, batch, jnp.asarray(1.0), jnp.asarray(1.0)
        )
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(state1, step=int(state1.step))
        restored = mgr.restore(state1)
        _tree_equal(restored.params, state1.params)
        _tree_equal(restored.opt_state, state1.opt_state)
        state2, aux = trainer._train_step(
            restored, batch, jnp.asarray(1.0), jnp.asarray(1.0)
        )
        assert np.isfinite(float(aux["loss"]))
        assert int(state2.step) == int(state1.step) + 1
