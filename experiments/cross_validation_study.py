#!/usr/bin/env python
"""K-fold cross-validation demonstration (real per-fold training).

The reference's CrossValidationEvaluator has its training step commented out
(it cross-validates untrained models, evaluation.py:685-782). This run trains
every fold and reports mean/std/CI. Writes experiments/RESULTS_cv.{md,json}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--n_samples", type=int, default=8000)
    p.add_argument("--out", default="experiments/RESULTS_cv")
    args = p.parse_args(argv)

    import jax

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.eval.cross_validation import CrossValidationEvaluator
    from tpu_deer.models.deer_model import DEERModelConfig
    from tpu_deer.train.trainer import TrainingConfig

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(
        SyntheticConfig(n_train=args.n_samples, n_val=10, n_test=10)
    )
    ds = ArrayDataset(splits["train"], "synthetic")

    cv = CrossValidationEvaluator(
        DEERModelConfig(
            compute_dtype="bfloat16" if platform == "tpu" else "float32"
        ),
        TrainingConfig(
            learning_rate=2e-3, batch_size=512, num_epochs=args.epochs,
            warmup_epochs=1, scheduler="cosine", val_frequency=5,
            early_stopping_patience=50,
        ),
        n_folds=args.folds,
    )
    t0 = time.time()
    results = cv.run(ds, epochs_per_fold=args.epochs)
    elapsed = time.time() - t0

    with open(args.out + ".json", "w") as f:
        json.dump(results, f, indent=2, default=float)
    md = [
        "# K-fold cross-validation — computed results",
        "",
        f"- platform: **{platform}**, {args.folds} folds × {args.epochs} "
        f"epochs on {args.n_samples} samples, {elapsed:.0f}s total",
        "- (the reference's CV evaluates untrained models — its training step",
        "  is commented out; every fold here actually trains)",
        "",
        "| statistic | value |",
        "|---|---|",
        f"| CCC mean ± std | {results['ccc_mean']:.3f} ± {results['ccc_std']:.3f} |",
        f"| CCC 95% CI | [{results['ccc_ci'][0]:.3f}, {results['ccc_ci'][1]:.3f}] |",
        f"| MAE mean ± std | {results['mae_mean']:.3f} ± {results['mae_std']:.3f} |",
        "| calibrated ECE mean | "
        + f"{sum(f['ece'] for f in results['folds']) / len(results['folds']):.3f} |",
        "",
        "Per-fold CCC: "
        + ", ".join(f"{f['ccc_average']:.3f}" for f in results["folds"]),
        "Per-fold ECE (calibrated on a held-out train slice): "
        + ", ".join(f"{f['ece']:.3f}" for f in results["folds"]),
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"ccc_mean": results["ccc_mean"],
                      "ccc_std": results["ccc_std"]}, indent=2))
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
