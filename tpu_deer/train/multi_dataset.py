"""Multi-dataset training + REAL cross-dataset transfer evaluation.

Capability parity with reference `experiments/multi_dataset_framework.py`
(MultiDatasetFramework, :361-467) — with the placeholders made real:

  * run_multi_dataset_training — the reference RETURNS HARDCODED headline
    numbers (multi_dataset_framework.py:446-455). Here the joint model is
    actually trained (curriculum-sampled, dataset-weighted) and evaluated
    per dataset.
  * evaluate_cross_dataset — the reference returns np.random.uniform scores
    (multi_dataset_framework.py:425). Here, for each ordered dataset pair
    (A → B), a model trained only on A is evaluated on B's test split, and
    transfer effectiveness = CCC_B / CCC_A clamped to [0, 1]
    (metrics.py:330-346 definition).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Mapping, Optional

import numpy as np

from tpu_deer.core.metrics import cross_dataset_transfer_effectiveness
from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.eval.evaluator import DEERModelEvaluator
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Parity with reference DatasetConfig (multi_dataset_framework.py:48-57)."""

    name: str
    path: str = ""
    weight: float = 1.0


@dataclasses.dataclass
class MultiDatasetResults:
    joint: dict
    per_dataset: dict[str, dict]
    transfer: dict[str, dict]
    training_time_s: float

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


class MultiDatasetFramework:
    """Joint training over several datasets + transfer matrix evaluation."""

    def __init__(
        self,
        model_config: DEERModelConfig,
        training_config: TrainingConfig,
        datasets: Mapping[str, Mapping[str, ArrayDataset]],
        mesh=None,
        seed: int = 0,
    ):
        """datasets: {name: {"train": ds, "val": ds, "test": ds}}"""
        self.model_config = model_config
        self.training_config = training_config
        self.datasets = dict(datasets)
        self.mesh = mesh
        self.seed = seed
        self.joint_trainer: Optional[DEERTrainer] = None
        # Per-dataset provenance surfaced into the report (e.g. which text
        # backend featurized each corpus — registry meta).
        self.meta: dict = {}

    # -- joint training ----------------------------------------------------
    def _make_trainer(self, train_sets: Mapping[str, ArrayDataset]) -> DEERTrainer:
        model, params = create_complete_deer_model(self.model_config, seed=self.seed)
        steps = sum(
            max(1, len(d) // self.training_config.batch_size)
            for d in train_sets.values()
        )
        return DEERTrainer(
            model, params, self.training_config, steps_per_epoch=steps,
            mesh=self.mesh,
        )

    def run_multi_dataset_training(
        self, num_epochs: Optional[int] = None
    ) -> MultiDatasetResults:
        t0 = time.time()
        train_sets = {n: d["train"] for n, d in self.datasets.items()}
        val_sets = {n: d["val"] for n, d in self.datasets.items()}

        self.joint_trainer = self._make_trainer(train_sets)
        joint = self.joint_trainer.train(train_sets, val_sets, num_epochs=num_epochs)
        joint = {k: v for k, v in joint.items()}

        evaluator = DEERModelEvaluator(n_bootstrap=0)
        per_dataset = {}
        for name, d in self.datasets.items():
            test = d.get("test") or d["val"]
            res = evaluator.evaluate_model(
                self.joint_trainer, test, calibration_dataset=d["val"]
            )
            per_dataset[name] = res.to_dict()
            logger.info(
                f"[joint → {name}] CCC {res.ccc_average:.4f} ECE {res.ece:.4f}"
            )

        return MultiDatasetResults(
            joint=joint,
            per_dataset=per_dataset,
            transfer={},
            training_time_s=time.time() - t0,
        )

    # -- cross-dataset transfer -------------------------------------------
    def evaluate_cross_dataset(
        self, num_epochs: Optional[int] = None
    ) -> dict[str, dict]:
        """Train single-source models; evaluate each on every other dataset."""
        evaluator = DEERModelEvaluator(n_bootstrap=0)
        results: dict[str, dict] = {}
        for src, d_src in self.datasets.items():
            trainer = self._make_trainer({src: d_src["train"]})
            trainer.train(
                {src: d_src["train"]}, {src: d_src["val"]}, num_epochs=num_epochs
            )
            src_test = d_src.get("test") or d_src["val"]
            src_res = evaluator.evaluate_model(
                trainer, src_test, calibration_dataset=d_src["val"]
            )
            src_ccc = src_res.ccc_average
            for tgt, d_tgt in self.datasets.items():
                if tgt == src:
                    continue
                tgt_test = d_tgt.get("test") or d_tgt["val"]
                # Calibrate on the SOURCE validation split: in a transfer
                # setting the target's labels are unseen, so the deployable
                # uncertainty scale is the one fit on source data. Reuse the
                # scale fit for the source eval — the per-target re-predict
                # of the source val split would be pure tunnel latency.
                tgt_res = evaluator.evaluate_model(
                    trainer, tgt_test, calibration_scale=src_res.posthoc_scale
                )
                eff = cross_dataset_transfer_effectiveness(
                    src_ccc, tgt_res.ccc_average
                )
                results[f"{src}->{tgt}"] = {
                    "source_ccc": float(src_ccc),
                    "target_ccc": float(tgt_res.ccc_average),
                    "target_mae": float(tgt_res.mae_average),
                    "transfer_effectiveness": float(eff),
                }
                logger.info(
                    f"[{src}→{tgt}] src CCC {src_ccc:.4f} "
                    f"tgt CCC {tgt_res.ccc_average:.4f} eff {eff:.2%}"
                )
        return results

    def run_full_experiment(
        self,
        num_epochs: Optional[int] = None,
        transfer_epochs: Optional[int] = None,
        report_path: Optional[str] = None,
    ) -> MultiDatasetResults:
        results = self.run_multi_dataset_training(num_epochs)
        results.transfer = self.evaluate_cross_dataset(
            transfer_epochs or num_epochs
        )
        if report_path:
            self.generate_report(results, report_path)
        return results

    def generate_report(self, results: MultiDatasetResults, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = results.to_dict()
        payload["datasets"] = {
            n: {split: len(ds) for split, ds in d.items()}
            for n, d in self.datasets.items()
        }
        if self.meta:
            payload["meta"] = self.meta
        if results.transfer:
            effs = [
                v["transfer_effectiveness"] for v in results.transfer.values()
            ]
            payload["transfer_effectiveness_avg"] = float(np.mean(effs))
        with open(path, "w") as f:
            json.dump(payload, f, indent=2, default=float)
        return path


def main(argv=None) -> int:
    """CLI entry: joint multi-dataset experiment + transfer matrix + report.

    Parity with reference `python multi_dataset_framework.py`
    (multi_dataset_framework.py:513-548) — except the results are real.
    Falls back to three distinct synthetic datasets sharing a label function
    when no real dataset paths are configured.
    """
    import argparse

    from tpu_deer.data.registry import load_configured_datasets
    from tpu_deer.utils.config import load_yaml_config

    p = argparse.ArgumentParser(description="multi-dataset DEER experiment")
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--transfer_epochs", type=int, default=None)
    p.add_argument("--report", default="experiments/multi_dataset_report.json")
    p.add_argument("--quick", action="store_true")
    # Demonstration-run overrides: the YAML default lr (1e-4) is tuned for
    # long real-corpus runs and barely moves in a 15-epoch synthetic run.
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--n", type=int, default=None,
                   help="synthetic-fallback samples per dataset")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    config = load_yaml_config(args.config)

    loaded = load_configured_datasets(config, quick=args.quick)
    meta = loaded.pop("meta", {}) if loaded else {}
    if loaded:
        datasets = {
            name: {
                split: loaded[split][name]
                for split in ("train", "val", "test")
                if name in loaded.get(split, {})
            }
            for name in loaded["train"]
        }
        m = config["model"]
        model_cfg = DEERModelConfig(
            audio_dim=int(m["audio_dim"]), video_dim=int(m["video_dim"]),
            text_dim=int(m["text_dim"]), fusion_dim=int(m["fusion_dim"]),
        )
    else:
        logger.warning("no real datasets configured — synthetic 3-dataset run")
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits

        dims = dict(audio_dim=84, video_dim=256, text_dim=768)
        n = args.n if args.n is not None else (200 if args.quick else 1000)
        datasets = {}
        for i, name in enumerate(("iemocap", "ravdess", "meld")):
            splits = make_synthetic_splits(
                SyntheticConfig(
                    n_train=n, n_val=n // 4, n_test=n // 4, seed=100 + i,
                    label_seed=7, **dims,
                )
            )
            datasets[name] = {
                s: ArrayDataset(splits[s], name) for s in splits
            }
        model_cfg = DEERModelConfig()

    t = config["training"]
    weights = {
        k.lower(): float(v)
        for k, v in config["datasets"].get("weights", {}).items()
    }
    train_cfg = TrainingConfig(
        learning_rate=(
            args.lr if args.lr is not None else float(t["learning_rate"])
        ),
        batch_size=(
            args.batch_size
            if args.batch_size is not None
            else int(t["batch_size"])
        ),
        num_epochs=args.epochs or (3 if args.quick else int(t["num_epochs"])),
        warmup_epochs=min(int(t.get("warmup_epochs", 5)), 1 if args.quick else 5),
        dataset_weights=weights or {n: 1.0 for n in datasets},
        seed=int(t.get("seed", 42)),
    )

    fw = MultiDatasetFramework(model_cfg, train_cfg, datasets)
    fw.meta = meta or {"text_backend": {n: "precomputed-synthetic" for n in datasets}}
    results = fw.run_full_experiment(
        num_epochs=train_cfg.num_epochs,
        transfer_epochs=args.transfer_epochs or train_cfg.num_epochs,
        report_path=args.report,
    )
    print(json.dumps(
        {
            "per_dataset_ccc": {
                n: r["ccc_average"] for n, r in results.per_dataset.items()
            },
            "transfer": {
                k: v["transfer_effectiveness"] for k, v in results.transfer.items()
            },
            "report": args.report,
        },
        indent=2,
    ))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
