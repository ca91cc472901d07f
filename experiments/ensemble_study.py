#!/usr/bin/env python
"""Deep-ensemble study: what does the ensemble buy over one evidential model?

The reference motivates its NIG head against "ensemble methods" (reference
src/models/deer.py:1-20) but never ships one. This study trains the baseline
it argues against — a K-member deep ensemble of the flagship
(train/ensemble.py, all K members in one XLA program) — against a single
model with the same recipe, and measures:

  * accuracy (CCC) and in-distribution uncertainty quality (unc-err
    correlation, AUSE, calibrated ECE);
  * out-of-distribution detection via the epistemic channel, which is where
    ensembles should pay: cross-member disagreement reacts to inputs OFF the
    training manifold, which a single evidential model can only express
    through its learned evidence map. Two OOD sets probe this:
      - "shuffled": each feature column independently permuted across the
        test set — marginals identical, joint/cross-modal structure broken
        (the subtle case);
      - "scaled": features x 2.5 (the gross case).
    Score = mean epistemic uncertainty; metric = AUROC vs the clean test
    set. The ensemble's epistemic is reported both with and without the
    disagreement term to isolate its contribution.

Writes experiments/RESULTS_ensemble.{md,json}.
`--quick` runs a CPU-sized smoke (small data, few epochs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def auroc(neg: "np.ndarray", pos: "np.ndarray") -> float:
    """Rank-based AUROC (Mann-Whitney U): P(score(pos) > score(neg))."""
    import numpy as np

    scores = np.concatenate([neg, pos])
    ranks = np.empty(len(scores))
    order = np.argsort(scores, kind="mergesort")
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    r_pos = ranks[len(neg) :].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def make_probes(test: dict, rng) -> dict:
    """The study's four probe families over a dict of test arrays
    (audio/video/text [+ labels, carried through untouched]). Shared with
    experiments/ood_study.py so both studies score the SAME distribution
    shifts. Returns {name: arrays-dict}; 'scaled (control)' is a negative
    control (see the inline comments)."""
    import numpy as np

    shuffled = dict(test)
    for k in ("audio", "video", "text"):
        cols = test[k].copy()
        for c in range(cols.shape[1]):
            cols[:, c] = cols[rng.permutation(len(cols)), c]
        shuffled[k] = cols
    # scaled is a NEGATIVE CONTROL, not a probe: the encoder input stack is
    # Dense -> relu -> LayerNorm, which is positively homogeneous up to the
    # (zero-initialized, weight-decayed) biases, so a global feature gain is
    # normalized away almost exactly — every detector should sit at ~0.5.
    # (For audio features that is a desirable robustness: recording gain
    # should not register as epistemic novelty.)
    scaled = dict(test)
    for k in ("audio", "video", "text"):
        scaled[k] = (test[k] * 2.5).astype(np.float32)
    # shifted: additive offset — NOT absorbed by the homogeneous stack.
    shifted = dict(test)
    for k in ("audio", "video", "text"):
        shifted[k] = (test[k] + 2.0).astype(np.float32)
    # misaligned: every modality vector is real, but video/text come from
    # OTHER samples than the audio — cross-modal consistency broken.
    misaligned = dict(test)
    misaligned["video"] = test["video"][rng.permutation(len(test["video"]))]
    misaligned["text"] = test["text"][rng.permutation(len(test["text"]))]
    return {
        "shuffled": shuffled,
        "shifted": shifted,
        "misaligned": misaligned,
        "scaled (control)": scaled,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--n_train", type=int, default=131072)
    p.add_argument("--n_eval", type=int, default=8192)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--members", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1,
                   help="uncertainty-playbook recipe (RESULTS_uncertainty_"
                        "diag.md: dropout 0.3 destroys uncertainty ranking)")
    p.add_argument("--out", default="experiments/RESULTS_ensemble")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from tpu_deer.core import metrics as M
    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import benchmark_v2, make_synthetic_splits
    from tpu_deer.eval.calibration import fit_uncertainty_scale
    from tpu_deer.eval.uncertainty import sparsification_curve
    from tpu_deer.models.deer_model import (
        DEERModelConfig, create_complete_deer_model,
    )
    from tpu_deer.train.ensemble import EnsembleTrainer, create_deer_ensemble
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

    platform = jax.devices()[0].platform
    if args.quick:
        args.n_train, args.n_eval = 2048, 1024
        args.epochs, args.members = 6, 3
        args.batch_size = min(args.batch_size, 512)
        if args.out == "experiments/RESULTS_ensemble":
            # Never clobber the committed full-run artifact with a smoke.
            args.out = "experiments/RESULTS_ensemble_quick"

    dtype = "bfloat16" if platform == "tpu" else "float32"
    mcfg = DEERModelConfig(compute_dtype=dtype, dropout=args.dropout)

    # Benchmark v2: latent-structured cross-modal data, so the shuffled/
    # misaligned probes are genuine distribution shifts (v1's i.i.d.
    # features made them measure-preserving, hence vacuous).
    splits = make_synthetic_splits(benchmark_v2(
        n_train=args.n_train, n_val=args.n_eval, n_test=args.n_eval,
    ))
    train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
    val_ds = ArrayDataset(splits["val"], "synthetic")
    val = {"synthetic": val_ds}
    test = splits["test"]
    test_ds = ArrayDataset(test, "synthetic")

    # Data ceiling (MC oracle from the generative model): mu* = E[y|x] and
    # unc* = E[|y - mu*| | x], Monte-Carlo'd from the known signal and noise
    # scale. No model can beat these r/AUSE numbers on this data — quote
    # them next to the model rows (VERDICT r3 task 1: either corr >= 0.7 or
    # an explicit measured data-regime bound).
    o_rng = np.random.default_rng(7)
    sig, ns = test["signal"], test["noise_scale"][:, None]
    draws = np.tanh(
        sig[None] + ns[None] * o_rng.standard_normal((256, *sig.shape))
    ).astype(np.float32)
    mu_star = draws.mean(axis=0)
    unc_star = np.abs(draws - mu_star[None]).mean(axis=0).mean(axis=1)
    err_star = np.abs(test["labels"] - mu_star).mean(axis=1)
    ceiling = {
        "ccc": float(np.mean([
            M.ccc_np(test["labels"][:, d], mu_star[:, d]) for d in range(3)
        ])),
        "r": float(np.corrcoef(unc_star, err_star)[0, 1]),
        "ause": float(sparsification_curve(err_star, unc_star)["ause"]),
    }
    del draws

    # OOD variants of the test features (labels irrelevant for detection).
    rng = np.random.default_rng(123)
    ood_sets = {
        name: ArrayDataset(arrays, f"ood_{name.split()[0]}")
        for name, arrays in make_probes(test, rng).items()
    }

    def tcfg(seed):
        return TrainingConfig(
            learning_rate=2e-3, batch_size=args.batch_size,
            num_epochs=args.epochs, warmup_epochs=2, scheduler="cosine",
            val_frequency=max(1, args.epochs // 5),
            early_stopping_patience=10**9, seed=seed,
        )

    steps = max(1, args.n_train // args.batch_size)

    def id_metrics(trainer, name, predict=None):
        predict = predict or trainer.predict
        out = predict(test_ds)
        y = test["labels"]
        ccc = float(np.mean([
            M.ccc_np(y[:, d], out["mu"][:, d]) for d in range(3)
        ]))
        err = np.abs(out["mu"] - y).mean(axis=1)
        unc = out["uncertainty"].mean(axis=1)
        r = float(np.corrcoef(unc, err)[0, 1])
        ause = float(sparsification_curve(err, unc)["ause"])
        val_out = predict(val_ds)
        scale = fit_uncertainty_scale(
            val_out["mu"], val_ds.arrays["labels"],
            val_out["calibrated_uncertainty"],
        )
        ece = float(M.ece_np(
            out["mu"], y, scale * out["calibrated_uncertainty"]
        ))
        return out, {
            "name": name, "ccc_avg": ccc, "unc_err_corr": r,
            "ause": ause, "ece_calibrated": ece,
        }

    t0 = time.time()

    # --- single flagship --------------------------------------------------
    smodel, sparams = create_complete_deer_model(mcfg, seed=0)
    s_tr = DEERTrainer(smodel, sparams, tcfg(0), steps_per_epoch=steps)
    s_tr.train(train, val)
    s_out, s_row = id_metrics(s_tr, "single evidential model")
    s_epi = {"test": s_out["epistemic"].mean(axis=1)}
    for oname, ods in ood_sets.items():
        s_epi[oname] = s_tr.predict(ods)["epistemic"].mean(axis=1)
    s_row["ood_auroc"] = {
        oname: auroc(s_epi["test"], s_epi[oname]) for oname in ood_sets
    }

    # --- same trained model + MC dropout (Gal & Ghahramani 2016) ----------
    # No retraining: the S stochastic forwards reuse the single model's
    # weights, vmapped into one XLA program (trainer.predict_mc_dropout).
    mc_samples = 8
    mc_predict = lambda ds: s_tr.predict_mc_dropout(ds, n_samples=mc_samples)
    m_out, m_row = id_metrics(
        s_tr, f"single + MC dropout (S={mc_samples})", predict=mc_predict
    )
    m_epi = {"test": m_out["epistemic"].mean(axis=1)}
    for oname, ods in ood_sets.items():
        m_epi[oname] = mc_predict(ods)["epistemic"].mean(axis=1)
    m_row["ood_auroc"] = {
        oname: auroc(m_epi["test"], m_epi[oname]) for oname in ood_sets
    }

    # --- K-member deep ensemble --------------------------------------------
    emodel, stacked = create_deer_ensemble(mcfg, n_members=args.members, seed=1)
    e_tr = EnsembleTrainer(emodel, stacked, tcfg(1), steps_per_epoch=steps)
    e_tr.train(train, val)
    _, e_row = id_metrics(e_tr, f"deep ensemble (K={args.members})")

    # Per-member predictions: member CCC spread + disagreement isolation.
    # ONE single-model trainer, params swapped per member, so every member
    # reuses the same jitted eval step (CLAUDE.md: trainers compile their
    # own step — reuse them in loops).
    member_ccc, member_epi = [], {"test": [], **{o: [] for o in ood_sets}}
    member_mu = {"test": [], **{o: [] for o in ood_sets}}
    m_tr = DEERTrainer(
        emodel, e_tr.member_params(0), tcfg(1), steps_per_epoch=steps
    )
    for k in range(args.members):
        m_tr.state = m_tr.state.replace(params=e_tr.member_params(k))
        m_out = m_tr.predict(test_ds)
        member_ccc.append(float(np.mean([
            M.ccc_np(test["labels"][:, d], m_out["mu"][:, d]) for d in range(3)
        ])))
        member_epi["test"].append(m_out["epistemic"])
        member_mu["test"].append(m_out["mu"])
        for oname, ods in ood_sets.items():
            o_out = m_tr.predict(ods)
            member_epi[oname].append(o_out["epistemic"])
            member_mu[oname].append(o_out["mu"])

    def combined_epi(split, with_disagreement):
        epi = np.mean(member_epi[split], axis=0)
        if with_disagreement:
            epi = epi + np.var(member_mu[split], axis=0)
        return epi.mean(axis=1)

    e_row["member_ccc"] = member_ccc
    e_row["ood_auroc"] = {
        oname: auroc(combined_epi("test", True), combined_epi(oname, True))
        for oname in ood_sets
    }
    e_row["ood_auroc_no_disagreement"] = {
        oname: auroc(combined_epi("test", False), combined_epi(oname, False))
        for oname in ood_sets
    }

    elapsed = time.time() - t0
    rows = [s_row, m_row, e_row]
    md = [
        "# Deep ensemble vs MC dropout vs single evidential model — "
        "computed results",
        "",
        f"- platform: **{platform}**, {args.n_train} train samples, "
        f"{args.epochs} epochs, dropout {args.dropout} (uncertainty-"
        f"playbook recipe, RESULTS_uncertainty_diag.md), K={args.members} "
        f"members (one vmapped XLA program), {elapsed:.0f}s total",
        "- benchmark v2 (`data/synthetic.py:benchmark_v2`): latent-"
        "structured cross-modal data, so shuffled/misaligned probes are "
        "genuine distribution shifts",
        f"- **data ceiling** (MC oracle from the generative model): CCC "
        f"{ceiling['ccc']:.3f}, unc-err corr {ceiling['r']:.3f}, AUSE "
        f"{ceiling['ause']:.3f} — no model can beat these on this data; "
        f"read the corr column against the {ceiling['r']:.3f} bound",
        f"- member CCCs: {', '.join(f'{c:.3f}' for c in member_ccc)} -> "
        f"ensemble {e_row['ccc_avg']:.3f} (moment-matched combination)",
        "- OOD AUROC scores epistemic uncertainty as the detector: "
        "'shuffled' permutes each feature column independently (marginals "
        "kept, all correlation structure broken), 'shifted' adds +2.0 to "
        "every feature, 'misaligned' pairs each audio with another sample's "
        "video/text (every vector realistic, cross-modal consistency "
        "broken). 'scaled (control)' multiplies features by 2.5 — a "
        "NEGATIVE control: the encoders' Dense->relu->LayerNorm input stack "
        "is positively homogeneous up to near-zero biases, so global gain "
        "is normalized away and every detector should read ~0.5 (for audio, "
        "recording gain should NOT register as novelty)",
        "",
        "| model | CCC avg | unc-err corr | AUSE | ECE (cal.) | "
        + " | ".join(f"OOD {o}" for o in ood_sets) + " |",
        "|---|---|---|---|---|" + "---|" * len(ood_sets),
    ]
    for r in rows:
        md.append(
            f"| {r['name']} | {r['ccc_avg']:.3f} | {r['unc_err_corr']:.3f} "
            f"| {r['ause']:.3f} | {r['ece_calibrated']:.3f} | "
            + " | ".join(f"{r['ood_auroc'][o]:.3f}" for o in ood_sets)
            + " |"
        )
    nd = e_row["ood_auroc_no_disagreement"]
    best_member = max(member_ccc)
    probes = [o for o in ood_sets if "control" not in o]
    best_ood = max(
        max(r["ood_auroc"][o] for o in probes) for r in rows
    )
    md += [
        "",
        "Disagreement isolation (ensemble epistemic WITHOUT the "
        "cross-member disagreement term): "
        + ", ".join(f"{o} {nd[o]:.3f}" for o in ood_sets)
        + " — the delta vs the ensemble row is what member disagreement "
        "alone contributes.",
        "",
        "Takeaways (computed from this run, not asserted):",
    ]
    if e_row["ccc_avg"] > best_member:
        md.append(
            f"- Ensemble CCC {e_row['ccc_avg']:.3f} beats even the best "
            f"member ({best_member:.3f}) — the combination itself helps "
            f"(single model: {s_row['ccc_avg']:.3f})."
        )
    else:
        md.append(
            f"- Ensemble CCC {e_row['ccc_avg']:.3f} vs best member "
            f"{best_member:.3f}, single {s_row['ccc_avg']:.3f} — at this "
            f"data scale the combination does not beat the best member."
        )
    mc_delta = m_row["unc_err_corr"] - s_row["unc_err_corr"]
    md.append(
        f"- MC dropout (no retraining): unc-err corr "
        f"{s_row['unc_err_corr']:.3f} -> {m_row['unc_err_corr']:.3f} "
        f"({'+' if mc_delta >= 0 else ''}{mc_delta:.3f}), CCC "
        f"{s_row['ccc_avg']:.3f} -> {m_row['ccc_avg']:.3f}."
    )
    best_corr = max(r["unc_err_corr"] for r in rows)
    md.append(
        f"- Best unc-err corr {best_corr:.3f} against the data ceiling "
        f"{ceiling['r']:.3f} (the binary-hardness generative model bounds "
        f"what any uncertainty estimate can correlate with realized "
        f"error); best AUSE "
        f"{min(r['ause'] for r in rows):.3f} vs ceiling "
        f"{ceiling['ause']:.3f}."
    )
    if best_ood < 0.8:
        md.append(
            f"- HONEST NEGATIVE: none of the epistemic channels is a "
            f"reliable OOD detector on these probes (best AUROC "
            f"{best_ood:.3f}). The NIG evidence head extrapolates "
            f"confidently off-manifold — a known evidential-regression "
            f"failure mode — and member disagreement does not fully "
            f"rescue it. Deployment guardrails should come from conformal "
            f"intervals (eval/conformal.py) and input-space checks "
            f"(eval/ood.py Mahalanobis, RESULTS_ood.md), not from "
            f"trusting epistemic spikes."
        )
    else:
        md.append(
            f"- On latent-structured data the epistemic channels DO "
            f"separate these probes (best AUROC {best_ood:.3f}); see "
            f"RESULTS_ood.md for the input-space guardrail comparison."
        )
    md += [
        "",
        "Reproduce: `python experiments/ensemble_study.py`"
        " (add `--quick` for a CPU smoke).",
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
