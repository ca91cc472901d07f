#!/usr/bin/env python
"""Uncertainty-quality sweep on the heteroscedastic synthetic benchmark.

Round-1 verdict: uncertainty-error correlation 0.506 / AUSE 0.208 — the
synthetic data carries a learnable difficulty signal (30% hard samples at
8x label noise) that the model wasn't capturing. This sweep searches the
evidential-loss weighting (evidence/kl/calibration) and compares ranking
quality of total vs aleatoric vs epistemic uncertainty, to find a recipe
with r >= 0.7 and AUSE <= 0.1 (reference claims r = 0.785, README.md:46).

Writes experiments/RESULTS_uncertainty_sweep.{md,json}.
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(splits, model_config, args, evidence_w, kl_w, cal_w, variant):
    import numpy as np

    from tpu_deer.core.metrics import pearson_np
    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.eval.uncertainty import UncertaintyAnalyzer
    from tpu_deer.models.deer_model import create_complete_deer_model
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    train_ds = ArrayDataset(splits["train"], "synthetic")
    val_ds = ArrayDataset(splits["val"], "synthetic")
    test_ds = ArrayDataset(splits["test"], "synthetic")

    model, params = create_complete_deer_model(model_config, seed=0)
    trainer = DEERTrainer(
        model, params,
        TrainingConfig(
            learning_rate=args.lr, batch_size=args.batch_size,
            num_epochs=args.epochs, warmup_epochs=2, scheduler="cosine",
            early_stopping_patience=100, val_frequency=5,
            evidence_weight=evidence_w, kl_weight=kl_w,
            calibration_alignment_weight=cal_w, loss_variant=variant,
        ),
        steps_per_epoch=len(train_ds) // args.batch_size,
    )
    trainer.train({"synthetic": train_ds}, {"synthetic": val_ds})
    pred = trainer.predict(test_ds)
    y = test_ds.arrays["labels"]
    err = np.abs(pred["mu"] - y).mean(axis=1)

    out = {}
    analyzer = UncertaintyAnalyzer()
    for kind in ("uncertainty", "aleatoric", "epistemic", "calibrated_uncertainty"):
        u = np.asarray(pred[kind]).mean(axis=1)
        ua = analyzer.analyze(pred["mu"], y, np.asarray(pred[kind]))
        out[kind] = {
            "r": pearson_np(err, u),
            "ause": ua["ause"],
        }
    from tpu_deer.core.metrics import ccc_np

    out["ccc_average"] = float(
        np.mean([ccc_np(y[:, i], pred["mu"][:, i]) for i in range(y.shape[1])])
    )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--n_train", type=int, default=16000)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--grid", default="full", choices=["full", "small"])
    p.add_argument("--out", default="experiments/RESULTS_uncertainty_sweep")
    args = p.parse_args(argv)

    import jax

    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.models.deer_model import DEERModelConfig

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(
        SyntheticConfig(
            n_train=args.n_train, n_val=args.n_train // 8,
            n_test=args.n_train // 8,
        )
    )
    model_config = DEERModelConfig(
        compute_dtype="bfloat16" if platform == "tpu" else "float32"
    )

    if args.grid == "small":
        grid = [(1.0, 0.1, 0.05, "v2")]
    else:
        # TrainingConfig knobs; under v2 they scale reg_weight (0.1×ew) and
        # kl_weight_v2 (0.1×kw).
        grid = list(itertools.product(
            (0.5, 1.0, 3.0, 10.0),  # evidence_weight
            (0.1, 1.0),             # kl_weight
            (0.05,),                # calibration_alignment_weight
            ("v2",),                # loss variant
        ))

    results = []
    t0 = time.time()
    for ew, kw, cw, variant in grid:
        res = run_one(splits, model_config, args, ew, kw, cw, variant)
        res["config"] = {
            "evidence_weight": ew, "kl_weight": kw,
            "calibration_alignment_weight": cw, "variant": variant,
        }
        results.append(res)
        print(json.dumps({
            "config": res["config"], "ccc": round(res["ccc_average"], 3),
            "total_r": round(res["uncertainty"]["r"], 3),
            "aleatoric_r": round(res["aleatoric"]["r"], 3),
            "total_ause": round(res["uncertainty"]["ause"], 3),
            "aleatoric_ause": round(res["aleatoric"]["ause"], 3),
        }), flush=True)

    payload = {"platform": platform, "elapsed_s": time.time() - t0,
               "runs": results}
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2, default=float)

    md = [
        "# Uncertainty-quality sweep — computed results",
        "",
        f"- platform: **{platform}**, {args.n_train} train samples, "
        f"{args.epochs} epochs per run, {payload['elapsed_s']:.0f}s total",
        "- r = Pearson(per-sample mean |error|, mean uncertainty); AUSE on "
        "the same pairs. 'aleatoric' ranks by β/(α−1) only — on "
        "heteroscedastic noise this is the informative component.",
        "",
        "| evidence_w | kl_w | CCC | r(total) | r(aleatoric) | AUSE(total) "
        "| AUSE(aleatoric) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        c = r["config"]
        md.append(
            f"| {c['evidence_weight']} | {c['kl_weight']} "
            f"| {r['ccc_average']:.3f} | {r['uncertainty']['r']:.3f} "
            f"| {r['aleatoric']['r']:.3f} | {r['uncertainty']['ause']:.3f} "
            f"| {r['aleatoric']['ause']:.3f} |"
        )
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
