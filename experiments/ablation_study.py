#!/usr/bin/env python
"""Real modality ablation study on the synthetic benchmark.

The reference README publishes an ablation table (audio 0.678 … A+V+T 0.840,
README.md:407-415) with no code behind it. This script computes one: trains
the flagship model on every modality subset and reports CCC/ECE per subset.
Writes experiments/RESULTS_ablation.{md,json}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--n_train", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--out", default="experiments/RESULTS_ablation")
    args = p.parse_args(argv)

    import jax

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.eval.ablation import AblationStudy
    from tpu_deer.models.deer_model import DEERModelConfig
    from tpu_deer.train.trainer import TrainingConfig

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(
        SyntheticConfig(
            n_train=args.n_train, n_val=args.n_train // 8,
            n_test=args.n_train // 8,
        )
    )
    study = AblationStudy(
        DEERModelConfig(
            compute_dtype="bfloat16" if platform == "tpu" else "float32"
        ),
        TrainingConfig(
            learning_rate=1e-3, batch_size=args.batch_size,
            num_epochs=args.epochs, warmup_epochs=1, scheduler="cosine",
            val_frequency=4, early_stopping_patience=50,
        ),
    )
    t0 = time.time()
    results = study.run(
        ArrayDataset(splits["train"], "synthetic"),
        ArrayDataset(splits["val"], "synthetic"),
        ArrayDataset(splits["test"], "synthetic"),
        num_epochs=args.epochs,
    )
    elapsed = time.time() - t0

    with open(args.out + ".json", "w") as f:
        json.dump(results, f, indent=2, default=float)

    md = [
        "# Modality ablation study — computed results",
        "",
        f"- platform: **{platform}**, {args.n_train} train samples, "
        f"{args.epochs} epochs per subset, {elapsed:.0f}s total",
        "- (The reference README publishes an ablation table with no code "
        "behind it; this one is trained and evaluated for real.)",
        "- ECE uses the deployable calibrated uncertainty with a post-hoc "
        "scale fit on the validation split (test untouched by the fit).",
        "",
        "| modalities | CCC avg | MAE avg | ECE (calibrated) |",
        "|---|---|---|---|",
    ]
    for key, res in results.items():
        md.append(
            f"| {key} | {res['ccc_average']:.3f} | {res['mae_average']:.3f} "
            f"| {res['ece']:.3f} |"
        )
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({k: round(v["ccc_average"], 4) for k, v in results.items()},
                     indent=2))
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
