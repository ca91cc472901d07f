#!/usr/bin/env python
"""Headline demonstration run: full-size flagship model on the synthetic
benchmark, on real hardware.

Trains CompleteDEERModel (full 84/256/768 config, 3.9M params — identical
param count to the reference) on the learnable heteroscedastic synthetic
dataset and reports the full metric bundle (CCC/MAE/RMSE, ECE, uncertainty-
error correlation, AUSE, bootstrap CIs). Writes
experiments/RESULTS_synthetic.md + JSON.

This is the run the reference *pretends* to have (its headline numbers are
hardcoded constants); here every number is computed.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render_figures(pred, labels, history, figures_dir, title_suffix=""):
    """L4 demonstration artifacts from a run's predictions: the full static
    plot set, the combined summary figure, and the self-contained
    interactive HTML dashboard.

    The main `uncertainties` fed to the reliability/scatter plots is the
    DEPLOYABLE calibrated uncertainty (what a user would threshold on —
    headline calibrated ECE 0.019), not raw NIG total uncertainty whose
    unbounded scale makes every reliability diagram look broken (the same
    raw-vs-calibrated distinction the ablation table needed). The
    decomposition plot keeps the raw aleatoric/epistemic components.
    """
    from tpu_deer.viz.html_report import create_interactive_report
    from tpu_deer.viz.report import (
        create_comprehensive_report,
        plot_summary_figure,
    )

    deployable = pred["calibrated_uncertainty"]
    paths = create_comprehensive_report(
        pred["mu"], labels, deployable,
        history=history, aleatoric=pred["aleatoric"],
        epistemic=pred["epistemic"], output_dir=figures_dir,
    )
    paths["summary"] = plot_summary_figure(
        pred["mu"], labels, deployable, history=history,
        save_path=os.path.join(figures_dir, "summary.png"),
    )
    paths["interactive"] = create_interactive_report(
        pred["mu"], labels, deployable, history=history,
        output_path=os.path.join(figures_dir, "interactive_report.html"),
        title=f"Multimodal DEER — headline run {title_suffix}",
    )
    print("figures:", ", ".join(sorted(paths)))
    return paths


def main(argv=None) -> int:
    # Defaults are the recipe from the uncertainty-ranking investigation
    # (RESULTS_uncertainty_diag.md): 1M samples, dropout 0.05, 100 fused
    # epochs at lr 1.2e-3 with 5-epoch warmup (2e-3 diverges at this step
    # count) — CCC 0.975, r(uncertainty, err) 0.80, AUSE 0.095 vs the data
    # ceiling r 0.848 / AUSE 0.075; reference's claim is r = 0.785.
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--n_train", type=int, default=1048576)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1.2e-3)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--dropout", type=float, default=0.05)
    # kl 0.01 (not the TrainingConfig 0.1 default): the NIG calibration
    # study (RESULTS_nig_calibration.md) measured that the softer KL pull
    # leaves CCC/MAE/unc-corr unchanged while the raw closed-form E|err|
    # channel lands scale-true (predicted/realized 1.02 vs 1.39) — at the
    # 0.1 default the full-scale headline's raw eabs ECE is 0.129; the KL
    # term was inflating beta/nu jointly (alpha->1 pull) at no metric gain.
    p.add_argument("--kl_weight", type=float, default=0.01)
    p.add_argument("--calibration_weight", type=float, default=0.15)
    # Replication seed (VERDICT r4 task 7: put a CI on the headline claim).
    # seed 0 reproduces the committed run exactly (data seed 42, init seed
    # 0); seed k draws fresh data AND fresh init. Non-zero seeds suffix the
    # output stem so replicas never clobber the canonical artifact.
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="experiments/RESULTS_synthetic")
    p.add_argument(
        "--figures", default=None, metavar="DIR",
        help="also render the full visualization report (static plots, "
        "combined summary figure, interactive HTML dashboard) into DIR",
    )
    p.add_argument(
        "--figures_from", default=None, metavar="NPZ",
        help="skip training: render --figures from a saved predictions npz "
        "(written by a previous run as <out>_predictions.npz)",
    )
    args = p.parse_args(argv)

    if args.figures_from:
        import numpy as np

        saved = np.load(args.figures_from)
        _render_figures(
            {k: saved[k] for k in saved.files if k != "labels"},
            saved["labels"],
            {
                "train_loss": list(saved["history_train_loss"]),
                "val_ccc": list(saved["history_val_ccc"]),
            }
            if "history_train_loss" in saved.files
            else None,
            args.figures or "experiments/figures_headline",
            title_suffix="(from saved predictions)",
        )
        return 0

    import jax
    import numpy as np

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.eval.comprehensive import ComprehensiveEvaluator
    from tpu_deer.eval.evaluator import DEERModelEvaluator
    from tpu_deer.eval.uncertainty import UncertaintyAnalyzer
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        count_parameters,
        create_complete_deer_model,
    )
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    if args.seed and args.out == "experiments/RESULTS_synthetic":
        args.out += f"_seed{args.seed}"

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(
        SyntheticConfig(
            n_train=args.n_train, n_val=args.n_train // 8,
            n_test=args.n_train // 8, seed=42 + args.seed,
        )
    )
    train_ds = ArrayDataset(splits["train"], "synthetic")
    val_ds = ArrayDataset(splits["val"], "synthetic")
    test_ds = ArrayDataset(splits["test"], "synthetic")

    config = DEERModelConfig(
        dropout=args.dropout,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
    )
    model, params = create_complete_deer_model(config, seed=args.seed)
    n_params = count_parameters(params)

    steps = len(train_ds) // args.batch_size
    trainer = DEERTrainer(
        model, params,
        TrainingConfig(
            learning_rate=args.lr, batch_size=args.batch_size,
            num_epochs=args.epochs, warmup_epochs=args.warmup_epochs,
            scheduler="cosine",
            # Early stopping deliberately disabled (patience counts
            # VALIDATION events — there are epochs/val_frequency of them):
            # the cosine schedule needs the full horizon; val CCC wobbles
            # mid-schedule would otherwise cut it short.
            early_stopping_patience=10**6, val_frequency=10,
            kl_weight=args.kl_weight,
            calibration_alignment_weight=args.calibration_weight,
            # one lax.scan dispatch per epoch — at 128 steps/epoch the
            # remote-dispatch latency otherwise dominates wall clock
            fused_epochs=True,
        ),
        steps_per_epoch=steps,
    )
    class _Heartbeat:
        """Minimal MetricWriter stand-in: one stderr mark per epoch/val so a
        stalled run is diagnosable from the log (the 100-epoch fused run is
        otherwise silent for ~30 min; a tunnel slowdown looks identical to a
        wedge without these)."""

        def scalar(self, key, value, step):
            if key == "train/lr":
                print(f"[epoch {step}] lr={value:.2e} "
                      f"t={time.time() - t0:.0f}s", file=sys.stderr, flush=True)

        def scalars(self, metrics, step, prefix=""):
            if prefix == "val/":
                print(f"[epoch {step}] val_ccc={metrics['ccc_average']:.4f} "
                      f"t={time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    results = trainer.train({"synthetic": train_ds}, {"synthetic": val_ds},
                            logger=_Heartbeat())
    train_time = time.time() - t0

    pred = trainer.predict(test_ds, return_nig=True)
    ev = DEERModelEvaluator(n_bootstrap=500).evaluate_arrays(
        pred["mu"], test_ds.arrays["labels"], pred["uncertainty"], n_params
    )
    # ECE with the learned calibration layer's output (the deployable
    # uncertainty) vs raw NIG total uncertainty.
    from tpu_deer.core.metrics import ece_np

    ece_calibrated = ece_np(
        pred["mu"], test_ds.arrays["labels"], pred["calibrated_uncertainty"]
    )
    # Raw NIG in the metric's units: the closed-form Student-t E|y-mu|
    # (nig_expected_abs_error) — a deterministic reparameterization of the
    # same 4 NIG outputs, no learned correction. The moment channel
    # beta(1+nu)/(nu(alpha-1)) is in variance units and carries a 1/(alpha-1)
    # inflation; see experiments/nig_calibration_study.py for the diagnosis.
    ece_raw_eabs = ece_np(pred["mu"], test_ds.arrays["labels"], pred["eabs"])
    # Post-hoc scalar scale fit on the VALIDATION split (standard temperature-
    # style calibration; test stays untouched by the fit).
    from tpu_deer.eval.calibration import fit_uncertainty_scale

    val_pred = trainer.predict(val_ds)
    best_scale = fit_uncertainty_scale(
        val_pred["mu"], val_ds.arrays["labels"],
        val_pred["calibrated_uncertainty"],
    )
    ece_posthoc = ece_np(
        pred["mu"], test_ds.arrays["labels"],
        best_scale * pred["calibrated_uncertainty"],
    )
    ua = UncertaintyAnalyzer().analyze(
        pred["mu"], test_ds.arrays["labels"], pred["uncertainty"],
        aleatoric=pred["aleatoric"], epistemic=pred["epistemic"],
    )
    # Ranking quality of the aleatoric component alone: on heteroscedastic
    # data it is the informative rank key (epistemic dilutes the total).
    ua_alea = UncertaintyAnalyzer().analyze(
        pred["mu"], test_ds.arrays["labels"], pred["aleatoric"]
    )
    report = ComprehensiveEvaluator().generate_report(
        pred["mu"], test_ds.arrays["labels"], pred["uncertainty"],
        model_name=f"CompleteDEERModel ({platform})",
    )

    payload = {
        "platform": platform,
        "seed": args.seed,
        "n_params": n_params,
        "epochs_run": results["epochs_run"],
        "train_time_s": train_time,
        "best_val_ccc": results["best_val_ccc"],
        "test": ev.to_dict(),
        "ece_calibrated": float(ece_calibrated),
        "ece_raw_eabs": float(ece_raw_eabs),
        "ece_posthoc": float(ece_posthoc),
        "posthoc_scale": best_scale,
        "uncertainty": {
            "uncertainty_error_correlation": ua["uncertainty_error_correlation"],
            "ause": ua["ause"],
            "aleatoric_error_correlation": ua_alea[
                "uncertainty_error_correlation"
            ],
            "aleatoric_ause": ua_alea["ause"],
            "decomposition": ua.get("decomposition"),
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2, default=float)

    md = [
        "# Synthetic headline run — computed results",
        "",
        f"- platform: **{platform}**, params: {n_params:,} "
        "(reference model: 3,918,324)",
        f"- train: {args.n_train} samples, {results['epochs_run']} epochs, "
        f"{train_time:.1f}s wall",
        "",
        "| metric | value |",
        "|---|---|",
        f"| CCC valence / arousal / dominance | "
        f"{ev.ccc['valence']:.3f} / {ev.ccc['arousal']:.3f} / "
        f"{ev.ccc['dominance']:.3f} |",
        f"| CCC average | {ev.ccc_average:.3f} |",
        f"| MAE average | {ev.mae_average:.3f} |",
        f"| RMSE average | {ev.rmse_average:.3f} |",
        f"| ECE (raw NIG, moment channel, variance units) | {ev.ece:.3f} |",
        f"| ECE (raw NIG, closed-form E\\|err\\| channel) | {ece_raw_eabs:.3f} |",
        f"| ECE (calibrated uncertainty) | {ece_calibrated:.3f} |",
        f"| ECE (+ post-hoc scale fit on val) | {ece_posthoc:.3f} |",
        f"| uncertainty-error correlation (total) | "
        f"{ua['uncertainty_error_correlation']:.3f} |",
        f"| uncertainty-error correlation (aleatoric) | "
        f"{ua_alea['uncertainty_error_correlation']:.3f} |",
        f"| AUSE (total / aleatoric) | {ua['ause']:.4f} / "
        f"{ua_alea['ause']:.4f} |",
        f"| CCC 95% CI (valence) | [{ev.confidence_intervals['valence'][0]:.3f},"
        f" {ev.confidence_intervals['valence'][1]:.3f}] |",
        "",
        "```",
        report,
        "```",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")

    # Save predictions so figures can be re-rendered without retraining
    # (--figures_from <out>_predictions.npz).
    np.savez(
        args.out + "_predictions.npz",
        labels=test_ds.arrays["labels"],
        history_train_loss=np.asarray(
            results["history"]["train_loss"], dtype=np.float64
        ),
        history_val_ccc=np.asarray(
            results["history"]["val_ccc"], dtype=np.float64
        ),
        **pred,
    )

    if args.figures:
        _render_figures(
            pred, test_ds.arrays["labels"], results["history"], args.figures,
            title_suffix=f"({platform}, CCC {ev.ccc_average:.3f})",
        )
    print(json.dumps(payload["test"]["ccc"], indent=2))
    print("uncertainty-error r:", payload["uncertainty"])
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
