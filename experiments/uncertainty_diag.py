#!/usr/bin/env python
"""Diagnose the uncertainty-ranking gap on the heteroscedastic benchmark.

The sweep (RESULTS_uncertainty_sweep.md) caps at r ~ 0.51 while the data
ceiling (oracle mu + oracle uncertainty) is r = 0.848 / AUSE = 0.075.
This script separates the two possible causes:

  * model-conditional ceiling: r(true noise scale, |model error|). If this
    is far below 0.84 the model's mu approximation error is the diluent.
  * uncertainty-head gap: r(model aleatoric, true noise scale). If this is
    low the head never learned the hardness feature at all.

Also probes training length (40 vs 100+ epochs) and a weaker v2 KL
(kl_regularizer_v2 pulls alpha->1, log beta->0 — i.e. toward CONSTANT
uncertainty — so its weight is the prime suspect).

Writes experiments/RESULTS_uncertainty_diag.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pearson(a, b):
    from tpu_deer.core.metrics import pearson_np

    return pearson_np(a, b)


def run_one(splits, model_config, args, epochs, evidence_w, kl_w, lr,
            moment_w=0.1, warmup=2):
    import numpy as np

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
            learning_rate=lr, batch_size=args.batch_size,
            num_epochs=epochs, warmup_epochs=warmup, scheduler="cosine",
            early_stopping_patience=1000, val_frequency=10,
            evidence_weight=evidence_w, kl_weight=kl_w,
            calibration_alignment_weight=0.05, loss_variant="v2",
            aleatoric_moment_weight=moment_w,
            # whole-epoch lax.scan: at 128 steps/epoch x 100 epochs the
            # ~50 ms/step remote-dispatch latency would dominate wall clock
            fused_epochs=True,
        ),
        steps_per_epoch=len(train_ds) // args.batch_size,
    )
    trainer.train({"synthetic": train_ds}, {"synthetic": val_ds})
    pred = trainer.predict(test_ds)
    y = test_ds.arrays["labels"]
    err = np.abs(np.asarray(pred["mu"]) - y).mean(axis=1)

    is_hard = splits["test"]["is_hard"].astype(bool)
    noise_scale = np.where(is_hard, 0.4, 0.1)

    analyzer = UncertaintyAnalyzer()
    out = {
        "epochs": epochs, "evidence_weight": evidence_w, "kl_weight": kl_w,
        "lr": lr,
        # model-conditional ceiling: best any uncertainty could do on THIS
        # model's errors
        "r_oracle_vs_model_err": pearson(noise_scale, err),
        "err_hard_mean": float(err[is_hard].mean()),
        "err_easy_mean": float(err[~is_hard].mean()),
    }
    from tpu_deer.core.metrics import ccc_np

    out["ccc_average"] = float(
        np.mean([ccc_np(y[:, i], np.asarray(pred["mu"])[:, i])
                 for i in range(y.shape[1])])
    )
    for kind in ("uncertainty", "aleatoric", "epistemic"):
        u = np.asarray(pred[kind]).mean(axis=1)
        ua = analyzer.analyze(np.asarray(pred["mu"]), y, np.asarray(pred[kind]))
        out[kind] = {
            "r_vs_err": pearson(err, u),
            # did the head learn the difficulty feature itself?
            "r_vs_noise_scale": pearson(noise_scale, u),
            "mean_hard": float(u[is_hard].mean()),
            "mean_easy": float(u[~is_hard].mean()),
            "ause": ua["ause"],
        }
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=16384)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--out", default="experiments/RESULTS_uncertainty_diag")
    args = p.parse_args(argv)

    import jax

    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.models.deer_model import DEERModelConfig

    platform = jax.devices()[0].platform

    # Round-2 findings (RESULTS_uncertainty_diag.json + diag_history/ —
    # batch→section map in diag_history/INDEX.md):
    #   batch 1: KL weight is NOT the cap; r(uncertainty, true noise) ~ 0 at
    #     16k samples; mu approximation error dominates realized error.
    #   batch 2: 64k samples + dropout 0.1 -> r(uncertainty, true noise)
    #     JUMPS to 0.78 (dropout 0.3 was blocking the hardness feature);
    #     CCC 0.94, but r(unc, err) still 0.54 because mu error remains
    #     partially approximation-dominated (r_oracle 0.48).
    #   batch 3 (these probes): 2x data again + aleatoric moment matching
    #     on/off — close the remaining mu gap and rank residuals directly.
    #   batch 3 results: moment_w 0 best (r_noise 0.89, AUSE 0.118); easy-
    #     sample err 0.093 vs oracle 0.023 — remaining gap is all mu
    #     approximation error. Batch 4: 2x data again, dropout -> 0.
    #   batch 4 results: 262k/drop 0.05/100ep -> CCC 0.966, r 0.680 total /
    #     0.701 aleatoric, AUSE 0.109/0.106, r_noise 0.936. Dropout 0.0 is
    #     WORSE (r 0.49) — some regularization helps uncertainty learning.
    #   batch 5 results: 524k/100ep -> r 0.769 / AUSE 0.095 (target met);
    #     the 150-epoch probe at 262k diverged (pre NaN-guard) — the data
    #     axis is the lever, not the epoch axis.
    #   batch 6 result: 1M @ lr 2e-3 collapsed (CCC 0.42) — same finite-
    #     divergence signature as the 150-epoch probe; 25.6k steps at peak
    #     lr 2e-3 is unstable (NaN guard keeps it finite but not healthy).
    #   batch 7: 1M retry at lr 1.2e-3 with 5-epoch warmup.
    # (epochs, evidence_w, kl_w, lr, n_train, dropout, batch, moment_w, warmup)
    probes = [
        (100, 1.0, 0.1, 1.2e-3, 64 * args.n_train, 0.05, 4096, 0.0, 5),
    ]
    results = []
    t0 = time.time()
    for epochs, ew, kw, lr, n_train, dropout, batch, moment_w, warmup in probes:
        splits = make_synthetic_splits(
            SyntheticConfig(
                n_train=n_train, n_val=max(2048, n_train // 16),
                n_test=max(2048, n_train // 16),
            )
        )
        model_config = DEERModelConfig(
            dropout=dropout,
            compute_dtype="bfloat16" if platform == "tpu" else "float32",
        )
        args.batch_size = batch
        res = run_one(splits, model_config, args, epochs, ew, kw, lr,
                      moment_w=moment_w, warmup=warmup)
        res.update(n_train=n_train, dropout=dropout, batch=batch,
                   moment_w=moment_w, warmup=warmup)
        results.append(res)
        print(json.dumps(res, default=float), flush=True)

    payload = {"platform": platform, "elapsed_s": time.time() - t0,
               "runs": results}
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2, default=float)
    print(f"wrote {args.out}.json in {payload['elapsed_s']:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
