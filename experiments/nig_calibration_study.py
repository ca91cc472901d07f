#!/usr/bin/env python
"""Diagnose and fix the raw-NIG miscalibration (headline raw ECE 0.201).

Round-3 verdict: the calibrated channel (ECE 0.019) carries every headline
while the evidential parameters themselves look badly miscalibrated — so is
NIG uncertainty *intrinsically* meaningful here, or only after a learned
correction?

Mechanism being tested (derived analytically, validated here):

  1. The ECE metric (core/metrics.py, matching reference metrics.py:214-279)
     compares mean uncertainty against mean |err| per quantile bin — a
     quantity in |error| units. The shipped "total uncertainty" channel is
     the moment decomposition E[sigma^2] + Var[mu] = beta*(1+nu)/(nu*(alpha-1))
     (reference deer.py:96-98) — a quantity in variance units. Units alone
     cannot explain everything, though: the round-3 decomposition showed the
     channel overestimates realized |err| by 3-11x even after sqrt.

  2. The v2 KL regularizer (reference losses.py:171-185) pulls alpha -> 1.
     At the pointwise v2-NLL optimum beta = alpha*nu*err^2, so the moment
     channel beta/(alpha-1) carries a 1/(alpha-1) inflation that the KL
     actively pins in place. The *posterior predictive* is still fine: the
     Student-t marginal scale divides by alpha, not alpha-1.

  3. Therefore the statistically correct raw channel is the closed-form
     t-marginal expected absolute error (core/nig.py:nig_expected_abs_error)
     — a deterministic reparameterization of the same 4 NIG outputs, no
     learned correction. If the NIG head is well-fit, its ECE should be low
     with NO training change; if training tweaks (smaller KL, v1 loss,
     moment matching) are also needed, the probes isolate that.

Probes: headline-default training, then one-knob variants (kl_weight 0.01/0,
loss v1, aleatoric moment matching). Each reports CCC, per-channel ECE
(moment/variance units, eabs units, calibrated), mean alpha/nu/beta, and the
scale ratio mean(eabs)/mean(|err|).

Writes experiments/RESULTS_nig_calibration.{json,md}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_probe(name, splits, args, platform, **overrides):
    import numpy as np

    from tpu_deer.core.metrics import ccc_np, ece_np, pearson_np
    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    train_ds = ArrayDataset(splits["train"], "synthetic")
    val_ds = ArrayDataset(splits["val"], "synthetic")
    test_ds = ArrayDataset(splits["test"], "synthetic")

    config = DEERModelConfig(
        dropout=0.1,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
    )
    model, params = create_complete_deer_model(config, seed=0)
    tc = dict(
        learning_rate=args.lr, batch_size=args.batch_size,
        num_epochs=args.epochs, warmup_epochs=2, scheduler="cosine",
        early_stopping_patience=10**6, val_frequency=10,
        calibration_alignment_weight=0.05,
        fused_epochs=platform == "tpu",
    )
    tc.update(overrides)
    trainer = DEERTrainer(
        model, params, TrainingConfig(**tc),
        steps_per_epoch=len(train_ds) // args.batch_size,
    )
    t0 = time.time()
    trainer.train({"synthetic": train_ds}, {"synthetic": val_ds})
    pred = trainer.predict(test_ds, return_nig=True)
    y = test_ds.arrays["labels"]
    mu = np.asarray(pred["mu"])
    err = np.abs(mu - y)

    out = {
        "probe": name,
        "overrides": {k: v for k, v in overrides.items()},
        "train_s": time.time() - t0,
        "ccc_avg": float(np.mean([
            ccc_np(y[:, i], mu[:, i]) for i in range(y.shape[1])
        ])),
        "mae": float(err.mean()),
        "mean_alpha": float(np.asarray(pred["alpha"]).mean()),
        "mean_nu": float(np.asarray(pred["nu"]).mean()),
        "mean_beta": float(np.asarray(pred["beta"]).mean()),
        # the three candidate raw channels + the learned one
        "ece_moment": ece_np(mu, y, pred["uncertainty"]),
        "ece_eabs": ece_np(mu, y, pred["eabs"]),
        "ece_calibrated": ece_np(mu, y, pred["calibrated_uncertainty"]),
        # scale + ranking quality of the closed-form channel
        "eabs_over_err": float(np.asarray(pred["eabs"]).mean() / err.mean()),
        "moment_over_var": float(
            np.asarray(pred["uncertainty"]).mean() / np.square(err).mean()
        ),
        "r_eabs_err": pearson_np(
            np.asarray(pred["eabs"]).mean(axis=1), err.mean(axis=1)
        ),
    }
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=65536)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke (4096 samples, 6 epochs)")
    p.add_argument("--out", default="experiments/RESULTS_nig_calibration")
    args = p.parse_args(argv)

    if args.quick:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        args.n_train, args.epochs, args.batch_size = 4096, 6, 256
        if args.out == "experiments/RESULTS_nig_calibration":
            # Never clobber the committed full-run artifact with a smoke.
            args.out = "experiments/RESULTS_nig_calibration_quick"

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits

    platform = jax.devices()[0].platform
    splits = make_synthetic_splits(SyntheticConfig(
        n_train=args.n_train,
        n_val=max(2048, args.n_train // 8),
        n_test=max(2048, args.n_train // 8),
    ))

    probes = [
        ("headline-default", {}),
        ("kl-0.01", {"kl_weight": 0.01}),
        ("kl-0", {"kl_weight": 0.0}),
        ("loss-v1", {"loss_variant": "v1", "evidence_weight": 0.1}),
        ("moment-match-0.1", {"aleatoric_moment_weight": 0.1}),
    ]
    if args.quick:
        probes = probes[:2]

    results = []
    t0 = time.time()
    for name, overrides in probes:
        res = run_probe(name, splits, args, platform, **overrides)
        results.append(res)
        print(json.dumps(res, default=float), flush=True)

    payload = {
        "platform": platform,
        "n_train": args.n_train, "epochs": args.epochs,
        "elapsed_s": time.time() - t0,
        "runs": results,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2, default=float)

    lines = [
        "# Raw-NIG calibration study — computed results",
        "",
        f"- platform: **{platform}**, n_train {args.n_train}, "
        f"epochs {args.epochs} ({payload['elapsed_s']:.0f}s total)",
        "- Channels: *moment* = shipped total uncertainty "
        "beta(1+nu)/(nu(alpha-1)) (variance units); *eabs* = closed-form "
        "Student-t E|y-mu| (nig_expected_abs_error — deterministic, no "
        "learned correction); *calibrated* = learned calibration layer.",
        "",
        "| probe | CCC | ECE moment | ECE eabs | ECE calib | "
        "mean α | mean ν | eabs/|err| | r(eabs,err) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['probe']} | {r['ccc_avg']:.3f} | {r['ece_moment']:.3f} "
            f"| {r['ece_eabs']:.3f} | {r['ece_calibrated']:.3f} "
            f"| {r['mean_alpha']:.2f} | {r['mean_nu']:.2f} "
            f"| {r['eabs_over_err']:.2f} | {r['r_eabs_err']:.2f} |"
        )
    # The narrative below interprets the committed full-configuration TPU
    # run. Any non-default rerun (quick smoke, changed sizes, probe subset)
    # gets only the computed table, so the prose can never contradict
    # numbers it wasn't written about.
    is_full_default = (
        not args.quick and args.n_train == 65536 and args.epochs == 30
        and len(results) == len(probes) == 5
    )
    if is_full_default:
        lines += [
        "",
        "## Reading the table (pinned interpretation of the full "
        "65k x 30-epoch TPU configuration)",
        "",
        "- **The NIG head is intrinsically calibrated; the shipped channel "
        "was the wrong point-summary.** At the untouched headline config the "
        "closed-form eabs channel hits ECE ~0.06 (vs 0.13-0.20 for the "
        "moment channel) with a 1.4x scale ratio; no learned correction "
        "involved. The moment channel's failure is structural: the v2 KL "
        "pins alpha near 1 and beta/(alpha-1) inflates by 1/(alpha-1) "
        "(moment/var column: 3-7x), while the t-marginal scale divides by "
        "alpha and stays finite.",
        "- **kl_weight 0.01 is strictly better for uncertainty** (eabs ECE "
        "~0.016, scale ratio 1.02) at identical CCC — the strong KL buys "
        "nothing on this benchmark. Kept at 0.1 by default for reference "
        "parity; flip it when uncertainty quality matters.",
        "- **loss-v1 diverged at this lr** (evidence_weight 0.1, lr 2e-3: "
        "alpha runs away to ~5200 and mu never fits — the v1 NLL's "
        "-alpha*log(2 beta) rewards unbounded evidence growth when the KL "
        "is the weaker v1 form). The v1 recipe needs its own lr/weight "
        "tuning; it is pinned for formula parity, not recommended for "
        "training.",
        "- **Aleatoric moment matching (0.1)** is the only probe that fixes "
        "the *moment* channel itself (ECE 0.054) — at the cost of "
        "collapsing nu (0.08) and a slightly degraded eabs. Use it only if "
        "a consumer insists on variance-unit uncertainties.",
        "- The learned calibration layer stays the belt-and-braces default; "
        "eabs makes the raw channel trustworthy when no calibration data "
        "exists (fresh domains, streaming cold-start).",
        ]
    else:
        lines += [
            "",
            "(Non-default configuration — computed table only; see the "
            "committed `RESULTS_nig_calibration.md` for the interpreted "
            "full run.)",
        ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}.json/.md in {payload['elapsed_s']:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
