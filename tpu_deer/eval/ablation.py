"""Modality ablation study: train/evaluate on every modality subset.

The reference *claims* an ablation table (README.md:407-415: audio 0.678,
video 0.591, text 0.743, A+V 0.774, A+T 0.812, A+V+T 0.840) but contains no
code that produces it. This module runs the study for real: for each subset,
the excluded modalities are zeroed at train AND eval time (the model's
uncertainty-aware attention learns to down-weight the dead inputs), and the
full metric bundle is reported per subset.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.eval.evaluator import DEERModelEvaluator
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

logger = logging.getLogger(__name__)

DEFAULT_SUBSETS: tuple[tuple[str, ...], ...] = (
    ("audio",),
    ("video",),
    ("text",),
    ("audio", "video"),
    ("audio", "text"),
    ("audio", "video", "text"),
)


def _mask_modalities(ds: ArrayDataset, keep: Sequence[str]) -> ArrayDataset:
    arrays = dict(ds.arrays)
    for mod in ("audio", "video", "text"):
        if mod not in keep and mod in arrays:
            arrays[mod] = np.zeros_like(arrays[mod])
    return ArrayDataset(arrays, ds.name)


class AblationStudy:
    def __init__(
        self,
        model_config: DEERModelConfig,
        training_config: TrainingConfig,
        subsets: Sequence[Sequence[str]] = DEFAULT_SUBSETS,
        seed: int = 0,
    ):
        self.model_config = model_config
        self.training_config = training_config
        self.subsets = [tuple(s) for s in subsets]
        self.seed = seed

    def run(
        self,
        train_ds: ArrayDataset,
        val_ds: ArrayDataset,
        test_ds: Optional[ArrayDataset] = None,
        num_epochs: Optional[int] = None,
    ) -> dict[str, dict]:
        test_ds = test_ds or val_ds
        evaluator = DEERModelEvaluator(n_bootstrap=0)
        results: dict[str, dict] = {}
        for subset in self.subsets:
            key = "+".join(m[0].upper() for m in subset)
            model, params = create_complete_deer_model(
                self.model_config, seed=self.seed
            )
            steps = max(1, len(train_ds) // self.training_config.batch_size)
            trainer = DEERTrainer(
                model, params, self.training_config, steps_per_epoch=steps
            )
            masked_train = _mask_modalities(train_ds, subset)
            masked_val = _mask_modalities(val_ds, subset)
            trainer.train(
                {train_ds.name: masked_train},
                {val_ds.name: masked_val},
                num_epochs=num_epochs,
            )
            res = evaluator.evaluate_model(
                trainer,
                _mask_modalities(test_ds, subset),
                calibration_dataset=masked_val,
            )
            results[key] = res.to_dict()
            results[key]["modalities"] = list(subset)
            logger.info(f"[ablation {key}] CCC {res.ccc_average:.4f} ECE {res.ece:.4f}")
        return results
