#!/usr/bin/env python
"""Aggregate headline replications into a CI (VERDICT r4 task 7).

Reads experiments/RESULTS_synthetic.json (seed 0) plus every
RESULTS_synthetic_seed*.json written by
`python experiments/synthetic_headline.py --seed K`, and writes
experiments/RESULTS_headline_ci.{json,md}: mean ± std and 95% t-CIs for
the flagship claims (CCC avg, calibrated ECE, raw-eabs ECE,
uncertainty-error r) over >=3 full-recipe seeds. CPU, instant.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _ci95(vals: np.ndarray) -> tuple[float, float]:
    from scipy import stats as sp_stats

    n = len(vals)
    if n < 2:
        return float(vals[0]), float(vals[0])
    half = sp_stats.t.ppf(0.975, n - 1) * vals.std(ddof=1) / np.sqrt(n)
    m = vals.mean()
    return float(m - half), float(m + half)


def main() -> int:
    paths = sorted(
        [os.path.join(HERE, "RESULTS_synthetic.json")]
        + glob.glob(os.path.join(HERE, "RESULTS_synthetic_seed*.json"))
    )
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        runs.append({
            "seed": d.get("seed", 0),
            "source": os.path.basename(p),
            "ccc_avg": float(np.mean(list(d["test"]["ccc"].values()))),
            "mae_avg": float(np.mean(list(d["test"]["mae"].values()))),
            "ece_calibrated": d["ece_calibrated"],
            "ece_raw_eabs": d["ece_raw_eabs"],
            "unc_err_r": d["uncertainty"]["uncertainty_error_correlation"],
            "train_time_s": d["train_time_s"],
        })
    if len(runs) < 2:
        print(f"only {len(runs)} run(s) found — run synthetic_headline.py "
              "--seed 1..K first")
        return 1

    agg = {}
    for key in ("ccc_avg", "mae_avg", "ece_calibrated", "ece_raw_eabs",
                "unc_err_r"):
        vals = np.array([r[key] for r in runs])
        lo, hi = _ci95(vals)
        agg[key] = {
            "mean": float(vals.mean()),
            "std": float(vals.std(ddof=1)),
            "ci95": [lo, hi],
        }

    out = os.path.join(HERE, "RESULTS_headline_ci")
    payload = {"n_seeds": len(runs), "runs": runs, "aggregate": agg}
    with open(out + ".json", "w") as f:
        json.dump(payload, f, indent=2)

    a = agg
    md = [
        "# Headline-claim replication CI — computed results",
        "",
        f"- {len(runs)} independent replications of the FULL headline "
        "recipe (1M samples, 100 fused epochs, kl 0.01 — "
        "`experiments/synthetic_headline.py`), fresh data draw AND fresh "
        "init per seed (`--seed K`). The round-4 verdict flagged the "
        "flagship claim as single-seed; this is its CI.",
        "",
        "| metric | per-seed | mean ± std | 95% CI |",
        "|---|---|---|---|",
    ]
    rows = [
        ("ccc_avg", "CCC average", 3),
        ("mae_avg", "MAE average", 3),
        ("ece_calibrated", "ECE (calibrated channel)", 3),
        ("ece_raw_eabs", "ECE (raw closed-form E|err| channel)", 3),
        ("unc_err_r", "uncertainty-error r", 3),
    ]
    for key, label, nd in rows:
        per = " / ".join(f"{r[key]:.{nd}f}" for r in runs)
        md.append(
            f"| {label} | {per} | {a[key]['mean']:.{nd}f} ± "
            f"{a[key]['std']:.{nd}f} | [{a[key]['ci95'][0]:.{nd}f}, "
            f"{a[key]['ci95'][1]:.{nd}f}] |"
        )
    md += [
        "",
        "## What replication bought (beyond the CI)",
        "",
        "Seed 2's FIRST run exposed a seed-dependent training instability: "
        "one finite catastrophic update inside fused epoch 65 (train loss "
        "-1.21 → +0.80) took val CCC 0.966 → 0.460 permanently — the "
        "non-finite containment never fires on finite damage, and lr "
        "backoff only shrinks FUTURE updates. The fix is "
        "`TrainingConfig.spike_rollback` (on by default): the spike "
        "detector's firing now restores the best-validation train-state "
        "snapshot. Rerun with rollback, the SAME spike fires at the same "
        "epoch (deterministic), the state rolls back, and the run finishes "
        "at CCC 0.966 — the seed-2 row above. Pinned by "
        "`tests/test_trainer.py::TestSpikeBackoff` (rollback + "
        "disabled-control pair); root-caused to the step in "
        "`RESULTS_spike.md` (evidential-NLL 1/(alpha-1) curvature blow-up "
        "in one DEER head, finite and clip-saturating).",
        "",
        "Per-run JSONs: " + ", ".join(f"`{r['source']}`" for r in runs) + ".",
        "",
        "Reproduce: `python experiments/synthetic_headline.py --seed K` per "
        "seed (TPU, ~20-60 min each), then `python "
        "experiments/headline_ci.py` (CPU, instant).",
    ]
    with open(out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote", out + ".md")
    print(json.dumps(agg, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
