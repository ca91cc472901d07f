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


class TestMeshValidation:
    def test_uneven_batch_rejected(self):
        mesh = create_mesh()
        model, params = create_complete_deer_model(SMALL, seed=0)
        with pytest.raises(ValueError, match="divisible"):
            DEERTrainer(
                model, params, TrainingConfig(batch_size=12, num_epochs=1),
                steps_per_epoch=1, mesh=mesh,
            )
