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
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--n_train", type=int, default=16384)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--dropout", type=float, default=0.1,
                   help="uncertainty-playbook recipe (RESULTS_uncertainty_"
                        "diag.md: dropout 0.3 destroys uncertainty ranking)")
    p.add_argument("--out", default="experiments/RESULTS_ablation")
    args = p.parse_args(argv)

    import jax

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import benchmark_v2, make_synthetic_splits
    from tpu_deer.eval.ablation import AblationStudy
    from tpu_deer.models.deer_model import DEERModelConfig
    from tpu_deer.train.trainer import TrainingConfig

    platform = jax.devices()[0].platform
    # Benchmark v2 (data/synthetic.py): latent-structured labels with
    # per-modality partial observability, so every single modality —
    # including video — carries real, bounded signal (linear-probe ceilings
    # ~A 0.64 / V 0.45 / T 0.85 / A+V+T 0.92) and hardness is learnable
    # from any subset. v1's dense projections left video sample-starved
    # (round-2 V-only CCC 0.053).
    splits = make_synthetic_splits(benchmark_v2(n_train=args.n_train))
    study = AblationStudy(
        DEERModelConfig(
            compute_dtype="bfloat16" if platform == "tpu" else "float32",
            dropout=args.dropout,
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
        f"{args.epochs} epochs per subset, dropout {args.dropout}, "
        f"{elapsed:.0f}s total",
        "- benchmark v2 (`data/synthetic.py:benchmark_v2`): latent-"
        "structured labels, per-modality partial observability — "
        "linear-probe CCC ceilings ~A 0.64 / V 0.45 / T 0.85 / A+V+T 0.92, "
        "hardness visible to every modality",
        "- dropout follows the uncertainty playbook "
        "(RESULTS_uncertainty_diag.md: 0.3 destroys uncertainty ranking)",
        "- (The reference README publishes an ablation table with no code "
        "behind it; this one is trained and evaluated for real.)",
        "- ECE uses the deployable calibrated uncertainty with a post-hoc "
        "scale fit on the validation split (test untouched by the fit).",
        "",
        "| modalities | CCC avg | MAE avg | ECE (calibrated) | unc-err corr |",
        "|---|---|---|---|---|",
    ]
    for key, res in results.items():
        md.append(
            f"| {key} | {res['ccc_average']:.3f} | {res['mae_average']:.3f} "
            f"| {res['ece']:.3f} | {res['uncertainty_error_correlation']:.3f} |"
        )
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({k: round(v["ccc_average"], 4) for k, v in results.items()},
                     indent=2))
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
