#!/usr/bin/env python
"""Fusion-zoo ablation: train the flagship with every fusion strategy.

The reference ships four alternative fusion modules (fusion.py:35-554) but
never compares them — no experiment instantiates anything except the
hierarchical stack. This study trains the SAME flagship model with each
`DEERModelConfig.fusion_type` on the synthetic benchmark and reports
CCC/MAE/calibrated-ECE per strategy, plus parameter counts.

Writes experiments/RESULTS_fusion.{md,json}.

Usage: python experiments/fusion_ablation.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FUSION_TYPES = ("hierarchical", "attention", "bilinear", "concat",
                "adaptive", "moe")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="CPU smoke sizes")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n_train", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--out", default="experiments/RESULTS_fusion")
    args = p.parse_args(argv)
    epochs = args.epochs or (2 if args.quick else 15)
    n_train = args.n_train or (512 if args.quick else 16384)
    if args.quick and args.out == "experiments/RESULTS_fusion":
        # Never clobber the committed full-run artifact with a smoke.
        args.out = "experiments/RESULTS_fusion_quick"

    import jax
    import numpy as np

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.eval.evaluator import DEERModelEvaluator
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        count_parameters,
        create_complete_deer_model,
    )
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(
        SyntheticConfig(
            n_train=n_train, n_val=max(n_train // 8, 128),
            n_test=max(n_train // 8, 128),
        )
    )
    train_ds = ArrayDataset(splits["train"], "synthetic")
    val_ds = ArrayDataset(splits["val"], "synthetic")
    test_ds = ArrayDataset(splits["test"], "synthetic")

    results = {}
    t0 = time.time()
    for fusion in FUSION_TYPES:
        cfg = DEERModelConfig(
            compute_dtype="bfloat16" if platform == "tpu" else "float32",
            fusion_type=fusion,
        )
        model, params = create_complete_deer_model(cfg, seed=0)
        n_params = count_parameters(params)
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(
                learning_rate=1e-3, batch_size=args.batch_size,
                num_epochs=epochs, warmup_epochs=1, scheduler="cosine",
                val_frequency=4, early_stopping_patience=50,
            ),
            steps_per_epoch=max(n_train // args.batch_size, 1),
        )
        trainer.train({"s": train_ds}, {"s": val_ds})
        evaluator = DEERModelEvaluator(n_bootstrap=0, seed=0)
        res = evaluator.evaluate_model(trainer, test_ds, n_parameters=n_params)
        results[fusion] = {
            "ccc_average": float(res.ccc_average),
            "mae_average": float(res.mae_average),
            "ece": float(res.ece),
            "n_params": int(n_params),
        }
        print(
            f"{fusion:>12}: CCC {res.ccc_average:.3f} MAE "
            f"{res.mae_average:.3f} ECE {res.ece:.3f} "
            f"({n_params:,} params)",
            flush=True,
        )
    elapsed = time.time() - t0

    with open(args.out + ".json", "w") as f:
        json.dump(results, f, indent=2)
    best = max(results, key=lambda k: results[k]["ccc_average"])
    md = [
        "# Fusion-zoo ablation — computed results",
        "",
        f"- platform: **{platform}**, {n_train} train samples, {epochs} "
        f"epochs per strategy, {elapsed:.0f}s total",
        "- same flagship model, only `DEERModelConfig.fusion_type` varies "
        "(the reference ships these modules but never compares them)",
        "- ECE uses the deployable calibrated uncertainty with a post-hoc "
        "scale fit on the validation split",
        "",
        "| fusion | CCC avg | MAE avg | ECE (calibrated) | params |",
        "|---|---|---|---|---|",
    ]
    for key, r in results.items():
        mark = " **(best)**" if key == best else ""
        md.append(
            f"| {key}{mark} | {r['ccc_average']:.3f} | "
            f"{r['mae_average']:.3f} | {r['ece']:.3f} | "
            f"{r['n_params']:,} |"
        )
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
