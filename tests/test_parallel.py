"""Multi-device tests on the 8-way virtual CPU mesh: DP training, TP layout,
distributed metric reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_deer.core import metrics as metrics_lib
from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.parallel import (
    MeshConfig,
    create_mesh,
    global_ccc_stats,
    shard_batch,
    shard_params,
)
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

SMALL = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=1, dropout=0.1,
)


class TestMesh:
    def test_create_default_mesh(self):
        mesh = create_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1

    def test_create_2d_mesh(self):
        mesh = create_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh(MeshConfig(data=3, model=2))

    def test_shard_batch_places_on_data_axis(self):
        mesh = create_mesh()
        batch = {"audio": np.ones((16, 8), np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded["audio"].sharding.spec == P("data")

    def test_shard_params_tp_layout(self):
        mesh = create_mesh(MeshConfig(data=4, model=2))
        _, params = create_complete_deer_model(SMALL, seed=0)
        sharded = shard_params(params, mesh)
        # fusion kernels sharded over model axis
        k = sharded["fusion"]["av_fusion_in"]["kernel"]
        assert k.sharding.spec[-1] == "model"
        # biases replicated
        b = sharded["fusion"]["av_fusion_in"]["bias"]
        assert b.sharding.spec == P()


class TestDistributedMetrics:
    def test_psum_ccc_matches_global(self):
        """shard_map + psum of sufficient stats == single-device CCC exactly."""
        from jax import shard_map

        mesh = create_mesh()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(512,)).astype(np.float32)
        y = (0.7 * x + 0.3 * rng.normal(size=(512,))).astype(np.float32)

        @jax.jit
        def dist_ccc(x, y):
            def shard_fn(xs, ys):
                stats = global_ccc_stats(xs, ys, axis_name="data")
                return metrics_lib.ccc_from_stats(stats)

            return shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P(),
            )(x, y)

        expected = float(metrics_lib.concordance_correlation_coefficient(x, y))
        got = float(dist_ccc(jnp.asarray(x), jnp.asarray(y)))
        assert np.isclose(got, expected, rtol=1e-5)


class TestDataParallelTraining:
    def _data(self):
        cfg = SyntheticConfig(
            n_train=256, n_val=128, n_test=0, audio_dim=16, video_dim=16,
            text_dim=16, label_noise=0.02, hard_fraction=0.0,
        )
        splits = make_synthetic_splits(cfg)
        return (
            {"synthetic": ArrayDataset(splits["train"], "synthetic")},
            {"synthetic": ArrayDataset(splits["val"], "synthetic")},
        )

    def test_dp_training_runs_and_learns(self):
        mesh = create_mesh()
        train, val = self._data()
        model, params = create_complete_deer_model(SMALL, seed=0)
        cfg = TrainingConfig(
            learning_rate=1e-2, batch_size=64, num_epochs=5, warmup_epochs=1,
            scheduler="constant", seed=0,
        )
        trainer = DEERTrainer(model, params, cfg, steps_per_epoch=4, mesh=mesh)
        results = trainer.train(train, val)
        assert np.isfinite(results["history"]["train_loss"][-1])
        assert results["best_val_ccc"] > 0.0

    def test_dp_matches_single_device_loss(self):
        """First-step loss must be identical with and without the mesh
        (same params, same batch, deterministic path)."""
        mesh = create_mesh()
        train, _ = self._data()
        # Separate param instances (same seed → same values): the train step
        # donates its state, so the two trainers must not share buffers.
        model, params1 = create_complete_deer_model(SMALL, seed=0)
        _, params2 = create_complete_deer_model(SMALL, seed=0)
        cfg = TrainingConfig(batch_size=64, num_epochs=1, seed=0)

        t_single = DEERTrainer(model, params1, cfg, steps_per_epoch=4)
        t_mesh = DEERTrainer(model, params2, cfg, steps_per_epoch=4, mesh=mesh)

        batch = next(iter(
            __import__("tpu_deer.data.pipeline", fromlist=["BatchIterator"])
            .BatchIterator(train["synthetic"], 64, shuffle=False).epoch(0)
        ))
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        _, aux1 = t_single._train_step(t_single.state, t_single._put(batch), w, s)
        _, aux2 = t_mesh._train_step(t_mesh.state, t_mesh._put(batch), w, s)
        assert np.isclose(float(aux1["mse"]), float(aux2["mse"]), rtol=1e-5)

    def test_tp_forward_matches_replicated(self):
        """Tensor-parallel param layout must not change the forward result."""
        mesh = create_mesh(MeshConfig(data=4, model=2))
        model, params = create_complete_deer_model(SMALL, seed=0)
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(8, 16)), dtype=jnp.float32)

        out_ref = model.apply({"params": params}, a, a, a)["mu_all"]
        sharded = shard_params(params, mesh)

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x, x, x)["mu_all"]

        out_tp = fwd(sharded, jax.device_put(a, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_tp), atol=1e-5
        )


class TestFSDP:
    def test_fsdp_layout_shards_large_params(self):
        from tpu_deer.parallel import fsdp_sharding_rules  # noqa: F401

        mesh = create_mesh(MeshConfig(data=4, model=2))
        _, params = create_complete_deer_model(SMALL, seed=0)
        sharded = shard_params(params, mesh, mode="fsdp")
        # TP axis preserved AND a data axis added on the fusion kernel.
        k = sharded["fusion"]["av_fusion_in"]["kernel"]
        assert "model" in k.sharding.spec
        assert "data" in k.sharding.spec
        # Biases stay replicated.
        b = sharded["fusion"]["av_fusion_in"]["bias"]
        assert b.sharding.spec == P()

    def test_unknown_mode_raises(self):
        mesh = create_mesh()
        _, params = create_complete_deer_model(SMALL, seed=0)
        with pytest.raises(ValueError, match="unknown param_sharding mode"):
            shard_params(params, mesh, mode="fspd")  # typo must not = tp

    def test_fsdp_forward_matches_replicated(self):
        mesh = create_mesh()
        model, params = create_complete_deer_model(SMALL, seed=0)
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(8, 16)), dtype=jnp.float32)

        out_ref = model.apply({"params": params}, a, a, a)["mu_all"]
        sharded = shard_params(params, mesh, mode="fsdp")

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x, x, x)["mu_all"]

        out = fwd(sharded, jax.device_put(a, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out), atol=1e-5)

    def test_fsdp_training_matches_single_device_loss(self):
        mesh = create_mesh()
        cfg_data = SyntheticConfig(
            n_train=128, n_val=0, n_test=0, audio_dim=16, video_dim=16,
            text_dim=16, label_noise=0.02, hard_fraction=0.0,
        )
        splits = make_synthetic_splits(cfg_data)
        ds = ArrayDataset(splits["train"], "synthetic")
        model, params1 = create_complete_deer_model(SMALL, seed=0)
        _, params2 = create_complete_deer_model(SMALL, seed=0)
        cfg = TrainingConfig(batch_size=64, num_epochs=1, seed=0)
        cfg_fsdp = TrainingConfig(
            batch_size=64, num_epochs=1, seed=0, param_sharding="fsdp"
        )
        t_single = DEERTrainer(model, params1, cfg, steps_per_epoch=2)
        t_fsdp = DEERTrainer(model, params2, cfg_fsdp, steps_per_epoch=2, mesh=mesh)
        # Optimizer state inherited the sharded layout (memory actually drops).
        mu = jax.tree_util.tree_leaves(t_fsdp.state.opt_state)
        assert any(
            getattr(x, "sharding", None) is not None
            and "data" in (x.sharding.spec or ())
            for x in mu
            if hasattr(x, "sharding") and x.ndim >= 2
        )

        from tpu_deer.data.pipeline import BatchIterator

        batch = next(iter(BatchIterator(ds, 64, shuffle=False).epoch(0)))
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        _, aux1 = t_single._train_step(t_single.state, t_single._put(batch), w, s)
        _, aux2 = t_fsdp._train_step(t_fsdp.state, t_fsdp._put(batch), w, s)
        assert np.isclose(float(aux1["mse"]), float(aux2["mse"]), rtol=1e-5)


class TestGradAccumulation:
    def test_accum_means_gradients(self):
        """Gradient-mean semantics, pinned exactly: k micro-steps on the SAME
        batch with accumulation == one plain step on that batch (the mean of
        identical gradients is the gradient; dropout off so the forward is
        deterministic). Note a k-way split of a larger batch is only
        approximately equivalent here — the loss has batch-coupled terms
        (cross-dim consistency of batch-mean uncertainties, v2 binned ECE),
        as BatchNorm does on other frameworks.

        Also pins that NO update happens before the k-th micro-step."""
        no_drop = DEERModelConfig(
            audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32,
            fusion_dim=64, attention_heads=4, encoder_layers=1, dropout=0.0,
        )
        cfg_data = SyntheticConfig(
            n_train=64, n_val=0, n_test=0, audio_dim=16, video_dim=16,
            text_dim=16, label_noise=0.02, hard_fraction=0.0,
        )
        splits = make_synthetic_splits(cfg_data)
        ds = ArrayDataset(splits["train"], "synthetic")
        model, params1 = create_complete_deer_model(no_drop, seed=0)
        _, params2 = create_complete_deer_model(no_drop, seed=0)
        init = jax.device_get(params1)

        t_accum = DEERTrainer(
            model, params1,
            TrainingConfig(
                batch_size=64, num_epochs=1, grad_accum_steps=2,
                scheduler="constant", seed=0,
            ),
            steps_per_epoch=2,
        )
        t_plain = DEERTrainer(
            model, params2,
            TrainingConfig(batch_size=64, num_epochs=1, scheduler="constant",
                           seed=0),
            steps_per_epoch=1,
        )

        batch_np = ds.slice(np.arange(64))
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        t_accum.state, _ = t_accum._train_step(
            t_accum.state, t_accum._put(batch_np), w, s
        )
        # Micro-step 1 of 2: params must be untouched.
        mid = jax.device_get(t_accum.state.params)
        for a, b in zip(
            jax.tree_util.tree_leaves(mid), jax.tree_util.tree_leaves(init)
        ):
            np.testing.assert_array_equal(a, b)
        # Optimizer-level equivalence, exact: feeding the same gradient tree
        # twice through the accumulating optimizer must produce (zero
        # updates, then the plain optimizer's update). Param-level
        # comparison across two differently-compiled jit programs is
        # sign-flaky on near-zero gradients (Adam's first step is
        # sign(g)-sized), so the contract is pinned here instead.
        grads = jax.grad(
            lambda p: t_plain._loss_fn(
                p, t_plain._put(batch_np), jax.random.PRNGKey(0), 1.0
            )[0]
        )(params2)
        opt_a = t_accum.optimizer
        st = opt_a.init(params2)
        u1, st = opt_a.update(grads, st, params2)
        for leaf in jax.tree_util.tree_leaves(jax.device_get(u1)):
            np.testing.assert_array_equal(leaf, np.zeros_like(leaf))
        u2, st = opt_a.update(grads, st, params2)
        u_plain, _ = t_plain.optimizer.update(
            grads, t_plain.optimizer.init(params2), params2
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(u2)),
            jax.tree_util.tree_leaves(jax.device_get(u_plain)),
        ):
            np.testing.assert_allclose(a, b, atol=1e-7)

    def test_schedule_counts_updates_not_microsteps(self):
        model, params = create_complete_deer_model(SMALL, seed=0)
        t = DEERTrainer(
            model, params,
            TrainingConfig(batch_size=32, num_epochs=10, grad_accum_steps=4,
                           warmup_epochs=2),
            steps_per_epoch=8,
        )
        assert t.total_steps == 2 * 10  # 8//4 updates per epoch


class TestMeshValidation:
    def test_uneven_batch_rejected(self):
        mesh = create_mesh()
        model, params = create_complete_deer_model(SMALL, seed=0)
        with pytest.raises(ValueError, match="divisible"):
            DEERTrainer(
                model, params, TrainingConfig(batch_size=12, num_epochs=1),
                steps_per_epoch=1, mesh=mesh,
            )
