"""Multi-host runtime tests: per-process batch sharding, runtime helpers,
and a real 2-process jax.distributed integration run on CPU.

Covers SURVEY §2.10 "per-host data loading with sharded batch feeding" and
the jax.distributed.initialize wiring the reference never had
(src/training/training.py:541-545 is an empty placeholder).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset, BatchIterator
from tpu_deer.parallel.runtime import (
    DistributedRuntime,
    RuntimeConfig,
    initialize_runtime,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dataset(n=64, d=4, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayDataset(
        {
            "audio": rng.normal(size=(n, d)).astype(np.float32),
            "labels": rng.normal(size=(n, 3)).astype(np.float32),
        },
        "t",
    )


class TestProcessShardedIterator:
    def test_slices_partition_the_global_batch(self):
        ds = _dataset(40)
        global_bs = 16
        full = list(
            BatchIterator(ds, global_bs, shuffle=True, seed=5).epoch_indices(0)
        )
        per_proc = [
            list(
                BatchIterator(
                    ds, global_bs, shuffle=True, seed=5,
                    process_index=p, process_count=4,
                ).epoch_indices(0)
            )
            for p in range(4)
        ]
        for b, (g_idx, g_mask) in enumerate(full):
            got_idx = np.concatenate([per_proc[p][b][0] for p in range(4)])
            got_mask = np.concatenate([per_proc[p][b][1] for p in range(4)])
            np.testing.assert_array_equal(got_idx, g_idx)
            np.testing.assert_array_equal(got_mask, g_mask)

    def test_local_batch_rows(self):
        ds = _dataset(32)
        it = BatchIterator(
            ds, 16, shuffle=False, process_index=1, process_count=2
        )
        batch = next(iter(it.epoch(0)))
        assert batch["audio"].shape[0] == 8
        # process 1 gets the second half of the unshuffled order
        np.testing.assert_array_equal(
            batch["audio"], ds.arrays["audio"][8:16]
        )

    def test_invalid_process_args(self):
        ds = _dataset(32)
        with pytest.raises(ValueError):
            BatchIterator(ds, 10, process_count=4)
        with pytest.raises(ValueError):
            BatchIterator(ds, 16, process_index=2, process_count=2)


class TestRuntimeSingleProcess:
    def test_initialize_noop(self):
        rt = initialize_runtime()
        assert isinstance(rt, DistributedRuntime)
        assert not rt.initialized_distributed
        assert rt.process_count == 1
        assert rt.process_index == 0
        assert len(rt.global_devices) >= 1

    def test_global_mesh_and_shard_batch(self):
        import jax
        from jax.sharding import PartitionSpec as P

        rt = initialize_runtime()
        mesh = rt.global_mesh()
        n = len(jax.devices())
        batch = {"x": np.arange(n * 4, dtype=np.float32).reshape(n * 4, 1)}
        out = rt.shard_batch(batch, mesh)
        assert out["x"].shape == (n * 4, 1)
        assert out["x"].sharding.spec == P("data")

    def test_put_params_single_process_uses_tp_rules(self):
        from jax.sharding import PartitionSpec as P

        from tpu_deer.models.deer_model import (
            DEERModelConfig,
            create_complete_deer_model,
        )

        cfg = DEERModelConfig(
            audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
            fusion_dim=32, attention_heads=4, encoder_layers=1,
        )
        _, params = create_complete_deer_model(cfg, seed=0)
        rt = initialize_runtime()
        mesh = rt.global_mesh()
        placed = rt.put_params(params, mesh)
        k = placed["fusion"]["av_fusion_in"]["kernel"]
        assert k.sharding.spec == P(None, "model")


@pytest.mark.slow
class TestTwoProcessIntegration:
    def test_two_process_train_step_matches(self, tmp_path):
        """2 real OS processes × 4 virtual CPU devices each: distributed
        init, global mesh, per-process batch feeding, one sharded train step
        + psum'd CCC, then a shard-aware checkpoint save -> restore -> step
        round trip on the shared filesystem. Both processes must agree and
        results be finite."""
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        ckpt_dir = str(tmp_path / "ckpt")

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=4"]
        )
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

        worker = os.path.join(REPO, "tests", "_runtime_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), ckpt_dir],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for pid in range(2)
        ]
        results = {}
        ckpt = {}
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            for line in out.splitlines():
                if line.startswith("RESULT"):
                    _, pid, loss, ccc = line.split()
                    results[int(pid)] = (float(loss), float(ccc))
                elif line.startswith("CKPT"):
                    _, pid, step, loss2 = line.split()
                    ckpt[int(pid)] = (int(step), float(loss2))
        assert set(results) == {0, 1}, results
        (l0, c0), (l1, c1) = results[0], results[1]
        assert np.isfinite(l0) and np.isfinite(c0)
        # SPMD: both controllers compute the identical global values.
        assert abs(l0 - l1) < 1e-6, results
        assert abs(c0 - c1) < 1e-6, results
        # Checkpoint round trip ran on both processes, restored the saved
        # step, and the post-resume losses agree.
        assert set(ckpt) == {0, 1}, ckpt
        assert ckpt[0][0] == ckpt[1][0] == 1, ckpt
        assert np.isfinite(ckpt[0][1]) and abs(ckpt[0][1] - ckpt[1][1]) < 1e-6
        # The save used the chunked shard-aware layout on the shared dir.
        step_dirs = [
            d for d in os.listdir(ckpt_dir) if d.startswith("step_")
        ]
        assert step_dirs, os.listdir(ckpt_dir)
        assert os.path.exists(
            os.path.join(ckpt_dir, step_dirs[0], "manifest.json")
        )
