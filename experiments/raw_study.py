#!/usr/bin/env python
"""Raw-media multi-corpus study: all three reference layouts end-to-end.

The reference parses IEMOCAP/RAVDESS/MELD layouts but fills the non-audio
channels with np.random placeholders and never trains on raw media
(multi_dataset_framework.py:214-358). This study drives real media through
`RawSequenceDEERModel` (Pallas audio front-end in-graph) for each corpus
layout separately AND jointly (shared vocabulary, concatenated corpora,
per-corpus test breakdown from `dataset_id`).

Writes experiments/RESULTS_raw.{md,json}. `--quick` runs a CPU smoke to
*_quick paths.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="CPU smoke sizes")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--out", default="experiments/RESULTS_raw")
    args = p.parse_args(argv)
    epochs = args.epochs or (8 if args.quick else 60)
    if args.quick and args.out == "experiments/RESULTS_raw":
        # Never clobber the committed full-run artifact with a smoke.
        args.out = "experiments/RESULTS_raw_quick"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_deer.core import metrics as M
    from tpu_deer.data import raw_corpus as rc
    from tpu_deer.models.hierarchical_deer import RawSequenceDEERModel
    from tpu_deer.ops.audio_frontend import (
        AudioFrontendConfig,
        audio_frame_features,
    )
    from tpu_deer.train.raw_trainer import (
        RawSequenceTrainer,
        RawTrainingConfig,
    )

    platform = jax.devices()[0].platform
    t0 = time.time()

    with tempfile.TemporaryDirectory() as tdir:
        # Fixture sizes: the IEMOCAP scaling probe showed 768 train
        # utterances reach ~0.98 CCC while 192 underlearn valence —
        # keep each corpus near that regime (RAVDESS is bounded by its
        # 24-actor structure: 42/actor = 756 train).
        if args.quick:
            sizes = {"iemocap": (48, 16, 16), "meld": (48, 16, 16)}
            per_actor = 3
        else:
            sizes = {"iemocap": (768, 96, 96), "meld": (768, 96, 96)}
            per_actor = 42
        roots = {
            "iemocap": rc.generate_raw_fixture(
                os.path.join(tdir, "iem"), *sizes["iemocap"], seed=11
            ),
            "ravdess": rc.generate_raw_fixture_ravdess(
                os.path.join(tdir, "rav"), n_per_actor=per_actor, seed=12
            ),
            "meld": rc.generate_raw_fixture_meld(
                os.path.join(tdir, "meld"), *sizes["meld"], seed=13
            ),
        }
        loaders = {
            "iemocap": rc.load_raw_corpus,
            "ravdess": rc.load_raw_ravdess,
            "meld": rc.load_raw_meld,
        }

        fcfg = AudioFrontendConfig()

        def train_and_eval(splits, vocab_size, tag):
            tr, te = splits["train"], splits.get("test") or splits["val"]
            model = RawSequenceDEERModel(
                encoder_dim=64 if args.quick else 128,
                fusion_dim=128 if args.quick else 256,
                vocab_size=vocab_size, num_heads=4, dropout=0.1,
            )
            frames = jax.vmap(
                lambda s: audio_frame_features(s, fcfg, use_pallas=False)
            )(jnp.asarray(tr["signal"][:2]))
            params = model.init(
                jax.random.PRNGKey(0), frames,
                jnp.asarray(tr["video_frames"][:2]),
                jnp.asarray(tr["token_ids"][:2]),
                jnp.asarray(tr["token_mask"][:2]),
            )["params"]
            trainer = RawSequenceTrainer(
                model, params,
                RawTrainingConfig(
                    learning_rate=2e-3,
                    batch_size=32 if args.quick else 64,
                    num_epochs=epochs,
                ),
                frontend_config=fcfg,
            )
            res = trainer.train(tr, splits.get("val"))
            pred = trainer.predict(te)
            y = te["labels"]
            ccc = [
                float(M.ccc_np(y[:, d], pred["mu"][:, d])) for d in range(3)
            ]
            row = {
                "corpus": tag,
                "n_train": int(len(tr["labels"])),
                "best_val_ccc": float(res["best_val_ccc"]),
                "test_ccc": ccc,
                "test_ccc_avg": float(np.mean(ccc)),
                "test_mae": float(np.abs(pred["mu"] - y).mean()),
            }
            print(
                f"{tag:>24}: test CCC {row['test_ccc_avg']:.3f} "
                f"(V/A/D {ccc[0]:.3f}/{ccc[1]:.3f}/{ccc[2]:.3f}) "
                f"MAE {row['test_mae']:.3f} "
                f"[{row['n_train']} train]",
                flush=True,
            )
            return trainer, pred, row

        rows = []
        # Per-corpus runs (each on its own vocabulary).
        for tag, loader in loaders.items():
            splits, vocab = loader(roots[tag])
            _, _, row = train_and_eval(splits, vocab.vocab_size, tag)
            rows.append(row)

        # Joint run: shared vocabulary, concatenated corpora.
        shared = rc.merge_vocabs(
            [loaders[t](roots[t])[1] for t in sorted(loaders)]
        )
        corpora = {
            t: loaders[t](roots[t], vocab=shared)[0] for t in loaders
        }
        joint = rc.combine_raw_splits(corpora)
        trainer, pred, row = train_and_eval(
            joint, shared.vocab_size, "joint (all three)"
        )
        # Per-corpus breakdown of the joint model on each corpus' test set.
        names = sorted(corpora)
        te = joint["test"]
        breakdown = {}
        for i, nm in enumerate(names):
            mask = te["dataset_id"] == i
            y, mu = te["labels"][mask], pred["mu"][mask]
            breakdown[nm] = float(np.mean([
                M.ccc_np(y[:, d], mu[:, d]) for d in range(3)
            ]))
        row["joint_per_corpus_ccc"] = breakdown
        rows.append(row)

    elapsed = time.time() - t0
    md = [
        "# Raw-media end-to-end runs — all three corpus layouts, computed",
        "",
        "Raw waveforms + video frame arrays + transcript token ids trained",
        "to gradient in ONE XLA program (Pallas audio front-end in-graph) —",
        "the dataflow the reference only sketches (encoders.py:144-172) and",
        "whose multi-dataset processors fill non-audio channels with",
        "np.random placeholders (multi_dataset_framework.py:252-348).",
        "Corpora: generated real-format fixtures in each reference layout",
        "(IEMOCAP session dirs, RAVDESS filename-coded Actor wavs + frame",
        "sidecars, MELD CSVs + media dirs); labels learnable from",
        "pitch/energy, frame brightness/motion, and (IEMOCAP/MELD) emotion",
        "keywords. RAVDESS text is faithfully constant (the spec's two",
        "fixed statements), so its text channel carries no label signal —",
        "its rows lean on audio+video alone, like the real corpus.",
        "",
        f"- platform: **{platform}**, {epochs} epochs per run, "
        f"{elapsed:.0f}s total",
        "- parsers shared with the feature-level loaders "
        "(`data/{iemocap,ravdess,meld}.py`); loaders in "
        "`data/raw_corpus.py`; joint run = shared vocabulary + "
        "concatenated corpora (`merge_vocabs` / `combine_raw_splits`)",
        "",
        "| corpus | n train | best val CCC | test CCC avg | V / A / D | "
        "test MAE |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        v, a, d = r["test_ccc"]
        md.append(
            f"| {r['corpus']} | {r['n_train']} | {r['best_val_ccc']:.3f} | "
            f"**{r['test_ccc_avg']:.3f}** | {v:.3f} / {a:.3f} / {d:.3f} | "
            f"{r['test_mae']:.3f} |"
        )
    joint_row = rows[-1]
    md += [
        "",
        "Joint-model per-corpus test CCC: "
        + ", ".join(
            f"{k} {v:.3f}"
            for k, v in joint_row["joint_per_corpus_ccc"].items()
        )
        + " — one model, one vocabulary, three corpus layouts.",
        "",
        "Reproduce: `python experiments/raw_study.py` (TPU, ~20 min; "
        "`--quick` for a CPU smoke). Single-corpus CLI: "
        "`python -m tpu_deer.cli --raw --raw_dataset "
        "{iemocap,ravdess,meld}`.",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    with open(args.out + ".json", "w") as f:
        json.dump({"rows": rows, "elapsed_s": elapsed}, f, indent=2)
    print("written:", args.out + ".md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
