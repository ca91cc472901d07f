#!/usr/bin/env python
"""OOD-guardrail study: does the fused-feature Mahalanobis detector close the
gap the uncertainty-method comparison exposed?

experiments/RESULTS_ensemble.md measured the HONEST NEGATIVE: epistemic
uncertainty (single model, MC dropout, even a K=4 deep ensemble) cannot
detect structure-breaking inputs (AUROC ~0.5 on 'shuffled'/'misaligned').
This study scores the shipped guardrail — eval/ood.py:MahalanobisOOD fitted
on the model's fused representation — on the SAME four probe families
(imported from ensemble_study.make_probes), against two baselines:

  * the epistemic channel (the thing that fails);
  * the SHIPPED guardrail: Mahalanobis in "input_norm" space (per-modality
    L2-normalized features — gain-invariant by construction; what the CLI
    fits and `server --ood` serves);
  * Mahalanobis on the model's fused representation (inherits encoder
    invariances but collapses off-manifold directions);
  * Mahalanobis on RAW concatenated input features — a model-free detector
    that sees every break but also (wrongly, for audio gain) flags the
    'scaled (control)' probe: it cannot distinguish recording volume from
    novelty. Every gain-invariant detector should sit at chance on the
    control.

Also reports TPR at the 1% training-FPR threshold — the number a deployment
actually acts on (server.py --ood flags requests at this operating point).

Writes experiments/RESULTS_ood.{md,json}. `--quick` for a CPU smoke.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ensemble_study import make_probes  # noqa: E402  (shared probe families)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--n_train", type=int, default=16384)
    p.add_argument("--n_eval", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=16,
                   help="shared cross-modal latent dimension; 0 reproduces "
                        "the i.i.d. generator, under which the shuffled/"
                        "misaligned probes are measure-preserving (vacuous)")
    p.add_argument("--out", default="experiments/RESULTS_ood")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.eval.ood import (
        MahalanobisOOD, input_norm_features, ood_auroc,
    )
    from tpu_deer.models.deer_model import (
        DEERModelConfig, create_complete_deer_model,
    )
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    platform = jax.devices()[0].platform
    if args.quick:
        args.n_train, args.n_eval, args.epochs = 2048, 1024, 4
        if args.out == "experiments/RESULTS_ood":
            # Never clobber the committed full-run artifact with a smoke.
            args.out = "experiments/RESULTS_ood_quick"

    dtype = "bfloat16" if platform == "tpu" else "float32"
    mcfg = DEERModelConfig(compute_dtype=dtype)

    # Latent-structured inputs (data/synthetic.py): real multimodal data has
    # within-modality correlations and cross-modal coupling — that structure
    # is exactly what the shuffled/misaligned probes break. On the default
    # i.i.d. generator those probes are measure-preserving maps (shuffling
    # i.i.d. columns changes nothing), so NO detector can or should fire —
    # the first run of this study measured exactly that (all AUROC ~0.5).
    splits = make_synthetic_splits(SyntheticConfig(
        n_train=args.n_train, n_val=args.n_eval, n_test=args.n_eval,
        latent_dim=args.latent_dim or None,
    ))
    train_ds = ArrayDataset(splits["train"], "synthetic")
    val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}
    test = splits["test"]
    probes = {
        name: ArrayDataset(arrays, f"ood_{name.split()[0]}")
        for name, arrays in make_probes(
            test, np.random.default_rng(123)
        ).items()
    }
    test_ds = ArrayDataset(test, "synthetic")

    t0 = time.time()
    model, params = create_complete_deer_model(mcfg, seed=0)
    trainer = DEERTrainer(
        model, params,
        TrainingConfig(
            learning_rate=2e-3, batch_size=args.batch_size,
            num_epochs=args.epochs, warmup_epochs=2, scheduler="cosine",
            val_frequency=max(1, args.epochs // 4),
            early_stopping_patience=10**9, seed=0,
        ),
        steps_per_epoch=max(1, args.n_train // args.batch_size),
    )
    trainer.train({"synthetic": train_ds}, val)

    # Detectors: input_norm (the shipped guardrail), fused-space, raw-input.
    fit_rows = min(len(train_ds), 8192)
    fit_slice = train_ds.slice(np.arange(fit_rows))
    fused_fit = trainer.predict(
        ArrayDataset(fit_slice, "fit"), return_fused=True
    )["fused"]
    n_cal = fit_rows // 5  # held-out threshold calibration (ood.calibrate)
    det_fused = MahalanobisOOD().fit(fused_fit[n_cal:]).calibrate(
        fused_fit[:n_cal]
    )
    mods = lambda a: (a["audio"], a["video"], a["text"])
    norm_fit = input_norm_features(*mods(fit_slice))
    det_norm = MahalanobisOOD(space="input_norm").fit(
        norm_fit[n_cal:]
    ).calibrate(norm_fit[:n_cal])
    raw_cat = lambda a: np.concatenate(
        [a["audio"], a["video"], a["text"]], axis=1
    )
    det_raw = MahalanobisOOD().fit(raw_cat(fit_slice))

    # Scores on clean test + every probe, all four detectors.
    def all_scores(arrays, ds):
        pred = trainer.predict(ds, return_fused=True)
        return {
            "epistemic": pred["epistemic"].mean(axis=1),
            "mahalanobis (input_norm, shipped)": det_norm.score_modalities(
                *mods(arrays)
            ),
            "mahalanobis (fused)": det_fused.score(pred["fused"]),
            "mahalanobis (raw input)": det_raw.score(raw_cat(arrays)),
        }

    s_test = all_scores(test, test_ds)
    s_probe = {name: all_scores(probes[name].arrays, probes[name])
               for name in probes}

    detectors = list(s_test)
    shipped = "mahalanobis (input_norm, shipped)"
    rows = []
    thr_norm = det_norm.threshold(0.01)
    for det in detectors:
        row = {"detector": det, "auroc": {}, "tpr_at_1pct_fpr": {}}
        for name in probes:
            row["auroc"][name] = ood_auroc(s_test[det], s_probe[name][det])
        if det == shipped:
            row["tpr_at_1pct_fpr"] = {
                name: float(np.mean(s_probe[name][det] > thr_norm))
                for name in probes
            }
            row["test_fpr_at_threshold"] = float(
                np.mean(s_test[det] > thr_norm)
            )
        rows.append(row)

    elapsed = time.time() - t0
    probe_names = list(probes)
    md = [
        "# OOD guardrail study — Mahalanobis detector spaces vs the "
        "epistemic channel",
        "",
        f"- platform: **{platform}**, {args.n_train} train samples, "
        f"{args.epochs} epochs, {elapsed:.0f}s total; probe transformations "
        "shared with RESULTS_ensemble.md (`ensemble_study.make_probes`) but "
        f"applied to LATENT-STRUCTURED inputs (latent_dim={args.latent_dim}, "
        "data/synthetic.py) — on the i.i.d. generator the shuffled/"
        "misaligned probes are measure-preserving, i.e. vacuous (measured: "
        "every detector at AUROC ~0.5)",
        "- detector fit: shrinkage-Mahalanobis (eval/ood.py) on "
        f"{fit_rows - n_cal} train-split rows + {n_cal} held out for "
        "threshold calibration; spaces: input_norm (per-modality "
        "L2-normalized, the shipped guardrail), fused representation, and "
        "raw concatenated 84+256+768-d features",
        "",
        "| detector | " + " | ".join(f"AUROC {n}" for n in probe_names)
        + " |",
        "|---|" + "---|" * len(probe_names),
    ]
    for row in rows:
        md.append(
            f"| {row['detector']} | "
            + " | ".join(f"{row['auroc'][n]:.3f}" for n in probe_names)
            + " |"
        )
    norm_row = next(r for r in rows if r["detector"] == shipped)
    fused_row = next(r for r in rows if r["detector"] == "mahalanobis (fused)")
    raw_row = next(r for r in rows if "raw" in r["detector"])
    epi_row = next(r for r in rows if r["detector"] == "epistemic")
    md += [
        "",
        "Operating point (shipped input_norm detector, threshold at 1% "
        "training FPR — what `server --ood` flags):",
        "",
        "| probe | TPR @ 1% FPR |",
        "|---|---|",
    ] + [
        f"| {n} | {norm_row['tpr_at_1pct_fpr'][n]:.3f} |"
        for n in probe_names
    ] + [
        f"| clean test (FPR) | {norm_row['test_fpr_at_threshold']:.3f} |",
        "",
        "Takeaways:",
        f"- The shipped input_norm detector closes the epistemic gap: "
        f"'shuffled' {epi_row['auroc']['shuffled']:.3f} (epistemic) -> "
        f"{norm_row['auroc']['shuffled']:.3f}, 'misaligned' "
        f"{epi_row['auroc']['misaligned']:.3f} -> "
        f"{norm_row['auroc']['misaligned']:.3f}, 'shifted' "
        f"{epi_row['auroc']['shifted']:.3f} -> "
        f"{norm_row['auroc']['shifted']:.3f}.",
        f"- Gain invariance: the 'scaled (control)' probe reads "
        f"{norm_row['auroc']['scaled (control)']:.3f} for input_norm "
        f"(chance = the desired behavior; invariant by construction) but "
        f"{raw_row['auroc']['scaled (control)']:.3f} for the raw-input "
        f"baseline — raw-space detection cannot distinguish recording gain "
        f"from genuine novelty.",
        f"- The model's fused representation is a WEAKER detector "
        f"(shuffled {fused_row['auroc']['shuffled']:.3f}, misaligned "
        f"{fused_row['auroc']['misaligned']:.3f}): training collapses "
        f"off-manifold directions the task never needed — fit the guardrail "
        f"on (normalized) inputs, not on learned features.",
        "- Zero extra dispatches in serving: the score is one [N,D]x[D,D] "
        "matmul inside the already-jitted forward "
        "(`serve.InferenceEngine(ood_detector=...)`).",
        "",
        "Reproduce: `python experiments/ood_study.py` (add `--quick` for a "
        "CPU smoke).",
    ]
    text = "\n".join(md) + "\n"
    with open(args.out + ".md", "w") as f:
        f.write(text)
    with open(args.out + ".json", "w") as f:
        json.dump({"rows": rows, "elapsed_s": elapsed, "args": vars(args)},
                  f, indent=1)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
