"""Multi-dataset framework tests: joint training + real transfer matrix."""

import json

import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import DEERModelConfig
from tpu_deer.train.multi_dataset import MultiDatasetFramework
from tpu_deer.train.trainer import TrainingConfig

MODEL = DEERModelConfig(
    audio_dim=12, video_dim=12, text_dim=12, encoder_dim=24, fusion_dim=48,
    attention_heads=4, encoder_layers=1, dropout=0.1,
)
TRAIN = TrainingConfig(
    learning_rate=5e-3, batch_size=64, num_epochs=6, warmup_epochs=0,
    scheduler="constant", early_stopping_patience=50,
    dataset_weights={"dsa": 1.0, "dsb": 0.8}, seed=0,
)


def _dataset(seed):
    # Distinct data draws, shared label function (label_seed) → real transfer
    # between the two "datasets" is possible and must be detected.
    cfg = SyntheticConfig(
        n_train=192, n_val=96, n_test=96, audio_dim=12, video_dim=12, text_dim=12,
        label_noise=0.05, hard_fraction=0.0, seed=seed, label_seed=7,
    )
    splits = make_synthetic_splits(cfg)
    return {
        split: ArrayDataset(splits[split], f"ds{seed}") for split in splits
    }


@pytest.fixture(scope="module")
def framework():
    # Same label function (same projection seed differences are only in data
    # draw) → transfer should be high; different seeds → different samples.
    return MultiDatasetFramework(
        MODEL, TRAIN,
        {"dsa": _dataset(1), "dsb": _dataset(2)},
        seed=0,
    )


class TestJointTraining:
    def test_joint_training_real_results(self, framework):
        results = framework.run_multi_dataset_training(num_epochs=6)
        assert set(results.per_dataset) == {"dsa", "dsb"}
        for name, res in results.per_dataset.items():
            assert np.isfinite(res["ccc_average"])
            # Real evaluation — reference returned hardcoded 0.840 here.
            assert res["n_samples"] == 96
        assert results.joint["best_val_ccc"] > 0.0


class TestTransfer:
    def test_transfer_matrix_real(self, framework):
        transfer = framework.evaluate_cross_dataset(num_epochs=6)
        assert set(transfer) == {"dsa->dsb", "dsb->dsa"}
        for pair, res in transfer.items():
            assert 0.0 <= res["transfer_effectiveness"] <= 1.0
            assert np.isfinite(res["source_ccc"])
            assert np.isfinite(res["target_ccc"])
        # Same label function across both synthetic datasets → genuine
        # transfer must be substantial (this would fail with random scores).
        assert transfer["dsa->dsb"]["target_ccc"] > 0.2

    def test_report_written(self, framework, tmp_path):
        from tpu_deer.train.multi_dataset import MultiDatasetResults

        results = MultiDatasetResults(
            joint={"best_val_ccc": 0.5},
            per_dataset={"dsa": {"ccc_average": 0.5}},
            transfer={
                "dsa->dsb": {
                    "source_ccc": 0.5, "target_ccc": 0.4,
                    "target_mae": 0.2, "transfer_effectiveness": 0.8,
                }
            },
            training_time_s=1.0,
        )
        path = str(tmp_path / "report.json")
        framework.generate_report(results, path)
        with open(path) as f:
            data = json.load(f)
        assert data["transfer_effectiveness_avg"] == pytest.approx(0.8)
        assert data["datasets"]["dsa"]["train"] == 192
