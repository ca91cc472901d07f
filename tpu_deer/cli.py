"""Command-line pipeline: full / train / evaluate / visualize / test modes.

Parity with reference `experiments/run_multimodal_deer.py` (argparse surface
at run_multimodal_deer.py:812-850, pipeline at :90-781), with the broken
seams repaired: dataloader creation, trainer wiring, and evaluation all
actually run (the reference silently fell back at each of these points —
SURVEY.md §2.9).

Usage:
    python -m tpu_deer.cli --mode full --quick
    python -m tpu_deer.cli --mode train --config configs/config.yaml
    python -m tpu_deer.cli --mode evaluate --model_path <ckpt_dir>
    python -m tpu_deer.cli --mode export --output_dir <dir>   # AOT serving artifact
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from typing import Optional

import numpy as np

logger = logging.getLogger("tpu_deer.cli")

# Named training recipes (config presets applied over the base YAML; a
# sibling file `configs/uncertainty.yaml` carries the same values for
# users who prefer a config file). "uncertainty" is the study-backed
# playbook (experiments/RESULTS_nig_calibration.md + RESULTS_synthetic.md):
# soft KL (0.01 — the 0.1 default inflates beta/nu at no CCC gain, raw
# eabs ECE 0.129 vs 0.055), light dropout, full cosine horizon, and the
# calibration-alignment weight the headline run trains the learned layer
# with. Application order: YAML -> recipe -> --quick -> explicit flags
# (so --quick still shrinks a recipe run and explicit flags always win).
RECIPES = {
    "uncertainty": {
        "model": {"dropout": 0.05},
        "training": {
            "learning_rate": 1.2e-3,
            "batch_size": 4096,
            "num_epochs": 100,
            "warmup_epochs": 5,
            "scheduler": "cosine",
            "kl_weight": 0.01,
            "calibration_alignment_weight": 0.15,
            "val_frequency": 10,
            # patience counts validation events; the cosine schedule needs
            # the full horizon (mid-schedule CCC wobble would cut it short)
            "early_stopping_patience": 10**6,
            "fused_epochs": True,  # one lax.scan dispatch per epoch
        },
    },
}


class MultimodalDEERPipeline:
    """Experiment orchestration (reference run_multimodal_deer.py:90-781)."""

    def __init__(
        self,
        config_path: Optional[str] = None,
        output_dir: str = "experiments",
        experiment_name: Optional[str] = None,
        overrides: Optional[dict] = None,
        quick: bool = False,
        resume: bool = False,
        recipe: Optional[str] = None,
    ):
        from tpu_deer.utils.config import load_yaml_config, save_yaml_config

        self.quick = quick
        # Preemption/interruption recovery: restart with --resume and the
        # SAME --output_dir/--experiment_name to continue from the latest
        # checkpoint (params + opt state + step + RNG + best metric).
        self.resume = resume
        self.config = load_yaml_config(config_path)
        if recipe is not None:
            if recipe not in RECIPES:
                raise ValueError(
                    f"unknown recipe {recipe!r}; available: {sorted(RECIPES)}"
                )
            for section, values in RECIPES[recipe].items():
                self.config.setdefault(section, {}).update(values)
            self.config["recipe"] = recipe
        if quick:
            # Quick validation: small but LEARNABLE (the reference's quick
            # mode could never show learning — its synthetic labels were
            # independent noise and 5 epochs × bs 8 is undertrained).
            self.config["training"]["num_epochs"] = 8
            self.config["training"]["batch_size"] = 32
            self.config["training"]["learning_rate"] = 3e-3
            self.config["training"]["warmup_epochs"] = 1
            self.config["training"]["scheduler"] = "constant"
            # Per-epoch scan compile outweighs dispatch savings at smoke
            # sizes (CLAUDE.md) — undo a recipe's fused_epochs for --quick.
            self.config["training"]["fused_epochs"] = False
            # A recipe's sparse validation cadence (e.g. every 10 epochs)
            # would never validate inside an 8-epoch smoke — best_val_ccc
            # would report -inf. Quick always validates every epoch.
            self.config["training"]["val_frequency"] = 1
        for key, value in (overrides or {}).items():
            section, _, name = key.partition(".")
            if name:
                self.config[section][name] = value

        if experiment_name is None:
            experiment_name = time.strftime("experiment_%Y%m%d_%H%M%S")
        self.experiment_dir = os.path.join(output_dir, experiment_name)
        for sub in ("models", "plots", "logs", "results", "configs", "data"):
            os.makedirs(os.path.join(self.experiment_dir, sub), exist_ok=True)
        # Back up the effective config into the experiment dir
        # (run_multimodal_deer.py:155-195 behavior).
        save_yaml_config(
            self.config, os.path.join(self.experiment_dir, "configs", "config.yaml")
        )

        seed = int(self.config["training"].get("seed", 42))
        np.random.seed(seed)
        self.seed = seed

        self.mesh = self._setup_mesh()
        self.model = None
        self.params = None
        self.trainer = None
        self.datasets = None

    # -- setup -----------------------------------------------------------
    def _setup_mesh(self):
        import jax

        from tpu_deer.parallel.mesh import MeshConfig, create_mesh

        n = len(jax.devices())
        if n <= 1:
            return None
        mesh_cfg = self.config["hardware"].get("mesh", {})
        return create_mesh(
            MeshConfig(
                data=int(mesh_cfg.get("data", -1)),
                model=int(mesh_cfg.get("model", 1)),
            )
        )

    def path(self, *parts) -> str:
        return os.path.join(self.experiment_dir, *parts)

    # -- components ------------------------------------------------------
    def create_model(self):
        from tpu_deer.models.deer_model import (
            DEERModelConfig,
            count_parameters,
            create_complete_deer_model,
        )

        m = self.config["model"]
        self.model_config = DEERModelConfig(
            audio_dim=int(m["audio_dim"]),
            video_dim=int(m["video_dim"]),
            text_dim=int(m["text_dim"]),
            encoder_dim=int(m.get("encoder_dim", 256)),
            fusion_dim=int(m["fusion_dim"]),
            emotion_dims=int(m["emotion_dims"]),
            attention_heads=int(m["attention_heads"]),
            encoder_layers=int(m.get("encoder_layers", 3)),
            dropout=float(m["dropout"]),
            compute_dtype=self.config["hardware"].get("compute_dtype", "float32"),
            fusion_type=str(m.get("fusion_type", "hierarchical")),
            moe_experts=int(m.get("moe_experts", 4)),
        )
        self.ensemble_members = int(
            self.config["training"].get("ensemble_members", 1)
        )
        if self.ensemble_members > 1:
            from tpu_deer.train.ensemble import create_deer_ensemble

            self.model, self.params = create_deer_ensemble(
                self.model_config, n_members=self.ensemble_members,
                seed=self.seed,
            )
            n_params = count_parameters(self.params)
            logger.info(
                f"deep ensemble created: {self.ensemble_members} members, "
                f"{n_params:,} total parameters "
                f"({n_params // self.ensemble_members:,} per member)"
            )
        else:
            self.model, self.params = create_complete_deer_model(
                self.model_config, seed=self.seed
            )
            n_params = count_parameters(self.params)
            logger.info(f"model created: {n_params:,} parameters")
        return self.model

    def create_datasets(self):
        """Real datasets when paths exist; synthetic fallback otherwise
        (loud, not silent — run_multimodal_deer.py:311-362 behavior)."""
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.data.registry import load_configured_datasets

        loaded = load_configured_datasets(self.config, quick=self.quick)
        if loaded:
            # Which semantic backend produced each corpus' text features
            # (bert | mlm | hashed) — recorded into the pipeline artifacts
            # so a run's text path is auditable.
            self.text_backends = loaded.pop("meta", {}).get("text_backend", {})
            self.datasets = loaded
            logger.info(f"loaded real datasets: {list(loaded['train'])}")
            return self.datasets

        logger.warning(
            "no real dataset paths found — using the synthetic fixture "
            "(set datasets.paths in the config to train on real data)"
        )
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits

        m = self.config["model"]
        n_train, n_val, n_test = (512, 128, 128) if self.quick else (1000, 200, 200)
        splits = make_synthetic_splits(
            SyntheticConfig(
                n_train=n_train, n_val=n_val, n_test=n_test,
                audio_dim=int(m["audio_dim"]), video_dim=int(m["video_dim"]),
                text_dim=int(m["text_dim"]), seed=self.seed,
            )
        )
        self.text_backends = {"synthetic": "precomputed-synthetic"}
        self.datasets = {
            split: {"synthetic": ArrayDataset(splits[split], "synthetic")}
            for split in ("train", "val", "test")
        }
        return self.datasets

    def create_trainer(self):
        from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

        t = self.config["training"]
        weights = {
            k.lower(): float(v)
            for k, v in self.config["datasets"].get("weights", {}).items()
        }
        self.training_config = TrainingConfig(
            learning_rate=float(t["learning_rate"]),
            weight_decay=float(t.get("weight_decay", 1e-5)),
            gradient_clip=float(t.get("gradient_clip", 1.0)),
            batch_size=int(t["batch_size"]),
            num_epochs=int(t["num_epochs"]),
            scheduler=t.get("scheduler", "cosine"),
            warmup_epochs=int(t.get("warmup_epochs", 5)),
            early_stopping_patience=int(t.get("early_stopping_patience", 10)),
            dataset_weights=weights or {"synthetic": 1.0},
            curriculum_learning=bool(t.get("curriculum_learning", True)),
            val_frequency=int(t.get("val_frequency", 1)),
            save_frequency=int(t.get("save_frequency", 10)),
            evidence_weight=float(t.get("evidence_weight", 1.0)),
            kl_weight=float(t.get("kl_weight", 0.1)),
            loss_variant=str(t.get("loss_variant", "v2")),
            calibration_alignment_weight=float(
                t.get("calibration_alignment_weight", 0.05)
            ),
            fused_epochs=bool(t.get("fused_epochs", False)),
            aleatoric_moment_weight=float(t.get("aleatoric_moment_weight", 0.0)),
            grad_accum_steps=int(t.get("grad_accum_steps", 1)),
            param_sharding=t.get("param_sharding", "tp"),
            spike_backoff=bool(t.get("spike_backoff", True)),
            spike_rollback=bool(t.get("spike_rollback", True)),
            ema_decay=float(t.get("ema_decay", 0.0)),
            ema_eval=bool(t.get("ema_eval", False)),
            seed=self.seed,
        )
        steps = sum(
            len(d) // self.training_config.batch_size
            for d in self.datasets["train"].values()
        )
        if getattr(self, "ensemble_members", 1) > 1:
            from tpu_deer.train.ensemble import EnsembleTrainer

            self.trainer = EnsembleTrainer(
                self.model, self.params, self.training_config,
                steps_per_epoch=max(1, steps), mesh=self.mesh,
            )
        else:
            self.trainer = DEERTrainer(
                self.model, self.params, self.training_config,
                steps_per_epoch=max(1, steps), mesh=self.mesh,
            )
        return self.trainer

    # -- stages ----------------------------------------------------------
    def run_training(self) -> dict:
        from tpu_deer.train.checkpoint import CheckpointManager
        from tpu_deer.utils.logging import MetricWriter

        ckpt = CheckpointManager(self.path("models"))
        writer = MetricWriter(self.path("logs"))
        results = self.trainer.train(
            self.datasets["train"], self.datasets["val"],
            logger=writer, checkpoints=ckpt, resume=self.resume,
        )
        history = {k: v for k, v in results.items() if k != "trainer"}
        with open(self.path("results", "training_history.json"), "w") as f:
            json.dump(history, f, indent=2, default=float)
        return results

    def run_evaluation(self) -> dict:
        from tpu_deer.eval.evaluator import DEERModelEvaluator
        from tpu_deer.models.deer_model import count_parameters

        test_sets = self.datasets.get("test") or self.datasets["val"]
        evaluator = DEERModelEvaluator(n_bootstrap=200, seed=self.seed)
        all_results = {}
        for name, ds in test_sets.items():
            res = evaluator.evaluate_model(
                self.trainer, ds, n_parameters=count_parameters(self.trainer.state.params)
            )
            all_results[name] = res.to_dict()
            logger.info(
                f"[{name}] CCC avg {res.ccc_average:.4f} "
                f"MAE avg {res.mae_average:.4f} ECE {res.ece:.4f}"
            )
        with open(self.path("results", "evaluation.json"), "w") as f:
            json.dump(all_results, f, indent=2)
        self._write_conformal_report(test_sets)
        self._write_ood_detector()
        return all_results

    def _write_ood_detector(self, max_fit_rows: int = 16384) -> None:
        """Fit the input-space Mahalanobis OOD guardrail on the train split
        and save it (results/ood_detector.npz) for `server --ood`. Fitted in
        "input_norm" space (per-modality L2-normalized features): gain-
        invariant by construction and the strongest detector measured in
        experiments/RESULTS_ood.md — epistemic uncertainty misses structure-
        breaking inputs (eval/ood.py). Host-side covariance fit only; no
        model forward needed."""
        from tpu_deer.eval.ood import MahalanobisOOD, input_norm_features

        train_sets = self.datasets.get("train") or {}
        if not train_sets:
            return
        feats = []
        for ds in train_sets.values():
            arrays = ds.arrays
            if len(ds) > max_fit_rows:
                idx = np.sort(np.random.default_rng(0).choice(
                    len(ds), max_fit_rows, replace=False
                ))
                arrays = ds.slice(idx)
            feats.append(input_norm_features(
                arrays["audio"], arrays["video"], arrays["text"]
            ))
        x = np.concatenate(feats)
        det = MahalanobisOOD(space="input_norm")
        if len(x) >= 256:
            # hold out 20% for threshold calibration: in-sample scores are
            # biased low when N is not >> D (eval/ood.py:calibrate)
            perm = np.random.default_rng(1).permutation(len(x))
            n_cal = len(x) // 5
            det.fit(x[perm[n_cal:]]).calibrate(x[perm[:n_cal]])
        else:
            det.fit(x)
        det.save(self.path("results", "ood_detector.npz"))
        logger.info(
            "OOD detector fitted on %d input_norm rows "
            "(threshold@1%%fpr %.1f) -> results/ood_detector.npz",
            len(x), det.threshold(0.01),
        )

    def _write_conformal_report(self, test_sets) -> None:
        """Split-conformal intervals: fit quantiles on the val split, report
        coverage/width on the test split (results/conformal.json). The saved
        quantiles are what a serving deployment loads to return calibrated
        intervals alongside predictions."""
        from tpu_deer.eval.conformal import ConformalCalibrator

        val_sets = self.datasets.get("val") or {}
        report = {}
        for name, test_ds in test_sets.items():
            cal_ds = val_sets.get(name) or next(iter(val_sets.values()), None)
            if cal_ds is None or cal_ds is test_ds:
                continue  # no held-out split to calibrate on
            pc = self.trainer.predict(cal_ds)
            pt = self.trainer.predict(test_ds)
            cal = ConformalCalibrator(alpha=0.1, normalized=True).fit(
                pc["mu"], np.sqrt(np.maximum(pc["uncertainty"], 1e-12)),
                cal_ds.arrays["labels"],
            )
            report[name] = cal.report(
                pt["mu"], np.sqrt(np.maximum(pt["uncertainty"], 1e-12)),
                test_ds.arrays["labels"],
            )
            cov = report[name]["empirical_coverage"]
            logger.info(
                f"[{name}] conformal 90% intervals: coverage "
                + "/".join(f"{c:.3f}" for c in cov)
            )
        if report:
            with open(self.path("results", "conformal.json"), "w") as f:
                json.dump(report, f, indent=2)

    def run_visualization(self) -> dict:
        from tpu_deer.viz.report import create_comprehensive_report

        test_sets = self.datasets.get("test") or self.datasets["val"]
        name, ds = next(iter(test_sets.items()))
        pred = self.trainer.predict(ds)
        # Attention weights need a forward that returns them:
        import jax.numpy as jnp

        out = self.trainer.model.apply(
            {"params": self.trainer.state.params},
            jnp.asarray(ds.arrays["audio"][:256]),
            jnp.asarray(ds.arrays["video"][:256]),
            jnp.asarray(ds.arrays["text"][:256]),
            deterministic=True,
        )
        return create_comprehensive_report(
            predictions=pred["mu"],
            targets=ds.arrays["labels"],
            uncertainties=pred["uncertainty"],
            attention_weights=np.asarray(out["attention_weights"]),
            history=self.trainer.history,
            aleatoric=pred["aleatoric"],
            epistemic=pred["epistemic"],
            output_dir=self.path("plots"),
        )

    def generate_final_report(self, train_results, eval_results) -> str:
        """Markdown final report (run_multimodal_deer.py:603-669)."""
        lines = [
            "# Multimodal DEER — Experiment Report",
            "",
            f"- experiment dir: `{self.experiment_dir}`",
            f"- quick mode: {self.quick}",
            f"- epochs run: {train_results.get('epochs_run')}",
            f"- training time: {train_results.get('training_time_s', 0):.1f}s",
            f"- best val CCC: {train_results.get('best_val_ccc', float('nan')):.4f}",
            "- serving channel (selected by validation ECE): "
            f"{train_results.get('serving_channel', 'eabs')}",
            "- text backend: "
            + (", ".join(
                f"{k}={v}" for k, v in getattr(self, "text_backends", {}).items()
            ) or "unknown"),
            "",
            "## Test results",
            "",
            "| dataset | CCC avg | CCC V | CCC A | CCC D | MAE avg | ECE |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, res in eval_results.items():
            ccc = res["ccc"]
            lines.append(
                f"| {name} | {res['ccc_average']:.4f} | {ccc.get('valence', 0):.4f} "
                f"| {ccc.get('arousal', 0):.4f} | {ccc.get('dominance', 0):.4f} "
                f"| {res['mae_average']:.4f} | {res['ece']:.4f} |"
            )
        report = "\n".join(lines) + "\n"
        path = self.path("results", "final_report.md")
        with open(path, "w") as f:
            f.write(report)
        return path

    def run_full_pipeline(self) -> dict:
        t0 = time.time()
        try:
            self.create_model()
            self.create_datasets()
            self.create_trainer()
            train_results = self.run_training()
            eval_results = self.run_evaluation()
            plots = self.run_visualization()
            report = self.generate_final_report(train_results, eval_results)
        except Exception as e:
            # Crash forensics (reference run_multimodal_deer.py:767-781) —
            # write the error report, then re-raise: failures stay loud.
            import traceback

            with open(self.path("results", "error_report.json"), "w") as f:
                json.dump(
                    {
                        "error": str(e),
                        "type": type(e).__name__,
                        "traceback": traceback.format_exc(),
                        "elapsed_s": time.time() - t0,
                    },
                    f,
                    indent=2,
                )
            raise
        summary = {
            "experiment_dir": self.experiment_dir,
            "best_val_ccc": train_results["best_val_ccc"],
            # Which uncertainty channel the best checkpoint should serve
            # ("calibrated" | "eabs"), chosen by validation ECE at
            # checkpoint time (docs/UNCERTAINTY.md "Channel selection").
            "serving_channel": train_results.get("serving_channel", "eabs"),
            "test_results": eval_results,
            "text_backend": getattr(self, "text_backends", {}),
            "plots": plots,
            "report": report,
            "total_time_s": time.time() - t0,
        }
        with open(self.path("results", "pipeline_summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=float)
        return summary

    def load_checkpoint(self, model_path: str):
        from tpu_deer.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(model_path)
        step = "best" if os.path.isdir(os.path.join(model_path, "best")) else None
        self.trainer.state = ckpt.restore(self.trainer.state, step=step)
        logger.info(f"restored checkpoint from {model_path}")


def run_raw_pipeline(args) -> dict:
    """--raw: raw-media end-to-end training (waveforms + frame arrays +
    transcripts → RawSequenceDEERModel with the Pallas front-end in-graph).

    The reference sketches this dataflow (encoders.py:144-172,418-459) but
    never trains it; here it runs: real-format corpus (datasets.raw_root in
    the config) or a LOUD generated fixture, → train → evaluate → artifacts.
    """
    import jax.numpy as jnp

    from tpu_deer.data import raw_corpus as rc
    from tpu_deer.eval.evaluator import DEERModelEvaluator
    from tpu_deer.models.hierarchical_deer import RawSequenceDEERModel
    from tpu_deer.train.raw_trainer import RawSequenceTrainer, RawTrainingConfig
    from tpu_deer.utils.config import load_yaml_config

    config = load_yaml_config(args.config)
    name = args.experiment_name or time.strftime("raw_experiment_%Y%m%d_%H%M%S")
    exp_dir = os.path.join(args.output_dir, name)
    for sub in ("results", "data", "logs"):
        os.makedirs(os.path.join(exp_dir, sub), exist_ok=True)

    layout = getattr(args, "raw_dataset", "iemocap")
    # Layout registry: (fixture generator taking (root, n_train, n_val,
    # n_test), loader). All three reference corpus layouts flow through the
    # same RawSequenceDEERModel (multi_dataset_framework.py:214-358 parses
    # them but fills non-audio channels with np.random placeholders).
    layouts = {
        "iemocap": (rc.generate_raw_fixture, rc.load_raw_corpus),
        "ravdess": (
            lambda root, n_train, n_val, n_test, seed: (
                rc.generate_raw_fixture_ravdess(
                    # 24 actors, 18/3/3 train/val/test by actor.
                    root, n_per_actor=max(1, round(n_train / 18)), seed=seed
                )
            ),
            rc.load_raw_ravdess,
        ),
        "meld": (
            lambda root, n_train, n_val, n_test, seed: (
                rc.generate_raw_fixture_meld(
                    root, n_train=n_train, n_val=n_val, n_test=n_test,
                    seed=seed,
                )
            ),
            rc.load_raw_meld,
        ),
    }
    generate_fixture, load_corpus = layouts[layout]

    raw_root = config["datasets"].get("raw_root")
    if not (raw_root and os.path.isdir(raw_root)):
        raw_root = os.path.join(exp_dir, "data", f"raw_fixture_{layout}")
        logger.warning(
            "no datasets.raw_root configured — generating a raw-media "
            f"fixture corpus in the {layout} layout under {raw_root} "
            "(real-format wavs + frame arrays + transcripts with learnable "
            "labels)"
        )
        # Non-quick sizes chosen from the scaling probe: 192 utterances left
        # valence underlearned (CCC 0.17); 768 reaches ~0.98 on all dims.
        n = (96, 24, 24) if args.quick else (768, 96, 96)
        generate_fixture(raw_root, *n, seed=42)

    splits, vocab = load_corpus(raw_root)
    logger.info(
        f"raw corpus: {', '.join(f'{k}={len(v['labels'])}' for k, v in splits.items())}"
        f" | vocab {vocab.vocab_size}"
    )

    model = RawSequenceDEERModel(
        encoder_dim=64 if args.quick else 128,
        fusion_dim=128 if args.quick else 256,
        vocab_size=vocab.vocab_size,
        num_heads=4,
        dropout=0.1,
    )
    import jax

    tr = splits["train"]
    # Init on a 2-sample batch (frame features computed outside init only
    # to derive shapes; training recomputes them in-graph each step).
    from tpu_deer.ops.audio_frontend import AudioFrontendConfig, audio_frame_features

    fcfg = AudioFrontendConfig()
    sample_frames = jax.vmap(
        lambda s: audio_frame_features(s, fcfg, use_pallas=False)
    )(jnp.asarray(tr["signal"][:2]))
    params = model.init(
        jax.random.PRNGKey(42),
        sample_frames,
        jnp.asarray(tr["video_frames"][:2]),
        jnp.asarray(tr["token_ids"][:2]),
        jnp.asarray(tr["token_mask"][:2]),
    )["params"]

    epochs = args.epochs or (12 if args.quick else 60)
    trainer = RawSequenceTrainer(
        model, params,
        RawTrainingConfig(
            learning_rate=args.learning_rate or 2e-3,
            batch_size=args.batch_size or (32 if args.quick else 64),
            num_epochs=epochs,
        ),
        frontend_config=fcfg,
    )
    results = trainer.train(tr, splits.get("val"))
    test = splits.get("test") or splits["val"]
    pred = trainer.predict(test)
    ev = DEERModelEvaluator(n_bootstrap=0).evaluate_arrays(
        pred["mu"], test["labels"], pred["uncertainty"]
    )
    summary = {
        "experiment_dir": exp_dir,
        "raw_layout": layout,
        "raw_root": raw_root,
        "vocab_size": vocab.vocab_size,
        "best_val_ccc": results["best_val_ccc"],
        "test": ev.to_dict(),
        "history": results["history"],
        "training_time_s": results["training_time_s"],
    }
    with open(os.path.join(exp_dir, "results", "raw_results.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    logger.info(
        f"raw e2e: best val CCC {results['best_val_ccc']:.4f} | "
        f"test CCC {ev.ccc_average:.4f} MAE {ev.mae_average:.4f}"
    )
    return summary


def run_component_tests() -> bool:
    """--mode test: fast in-process smoke checks (run_multimodal_deer.py:992-1030)."""
    import jax.numpy as jnp

    from tpu_deer.core import losses, nig
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        create_complete_deer_model,
    )

    ok = True
    try:
        model, params = create_complete_deer_model(
            DEERModelConfig(encoder_dim=64, fusion_dim=128, encoder_layers=1),
            seed=0,
        )
        out = model.apply(
            {"params": params},
            jnp.zeros((2, 84)), jnp.zeros((2, 256)), jnp.zeros((2, 768)),
        )
        assert out["mu_all"].shape == (2, 3)
        print("model forward: OK")

        ps = [out[f"{n}_params"] for n in ("valence", "arousal", "dominance")]
        loss = losses.multi_task_deer_loss(ps, jnp.zeros((2, 3)))
        assert bool(jnp.isfinite(loss["total_loss"]))
        print("DEER loss: OK")

        p = nig.nig_params_from_evidence(jnp.zeros((2, 3, 4)))
        u = nig.nig_uncertainties(p)
        assert bool(jnp.all(u["total"] > 0))
        print("NIG math: OK")

        import tempfile

        from tpu_deer.viz.report import PerformanceVisualizer

        with tempfile.TemporaryDirectory() as td:
            path = PerformanceVisualizer().plot_training_curves(
                {"train_loss": [3, 2, 1], "val_ccc": [0.1, 0.2],
                 "learning_rate": [1e-4] * 3},
                save_path=f"{td}/curves.png",
            )
            assert os.path.exists(path)
        print("visualization: OK")
    except Exception as e:  # pragma: no cover
        print(f"component test FAILED: {e}")
        ok = False
    return ok


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Multimodal DEER pipeline",
    )
    p.add_argument(
        "--mode",
        choices=["full", "train", "evaluate", "visualize", "test", "export"],
        default="full",
    )
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="experiments")
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--results_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in the "
                        "experiment's models/ dir (use with the same "
                        "--output_dir and --experiment_name)")
    p.add_argument("--quick", action="store_true",
                   help="8 epochs, batch size 32, lr 3e-3, small learnable "
                        "synthetic data (fast validation that shows learning)")
    p.add_argument("--recipe", choices=sorted(RECIPES), default=None,
                   help="named config preset applied over the base config "
                        "(explicit flags still win). 'uncertainty' = the "
                        "study-backed uncertainty playbook: kl_weight 0.01, "
                        "dropout 0.05, full cosine horizon, calibration "
                        "alignment 0.15 — the headline-run recipe "
                        "(RESULTS_nig_calibration.md / docs/UNCERTAINTY.md); "
                        "same values as configs/uncertainty.yaml")
    p.add_argument("--raw", action="store_true",
                   help="raw-media end-to-end training: waveforms + frame "
                        "arrays + transcripts through RawSequenceDEERModel "
                        "with the Pallas audio front-end in-graph "
                        "(datasets.raw_root in the config, or a generated "
                        "fixture)")
    p.add_argument("--raw_dataset", choices=["iemocap", "ravdess", "meld"],
                   default="iemocap",
                   help="corpus layout for --raw: IEMOCAP session dirs, "
                        "RAVDESS filename-coded Actor_XX wavs, or MELD "
                        "CSV + media dirs (reference multi_dataset_"
                        "framework.py:214-358 — all three flow through the "
                        "same raw-sequence model here)")
    p.add_argument("--ensemble", type=int, default=None, metavar="K",
                   help="train a K-member deep ensemble (all members in one "
                        "vmapped XLA program; predictions moment-matched, "
                        "cross-member disagreement added to the epistemic "
                        "channel). Equivalent to training.ensemble_members "
                        "in the config")
    p.add_argument("--platform", choices=["auto", "tpu", "cpu"],
                   default="auto",
                   help="device backend (reference run_multimodal_deer.py's "
                        "--gpu flag, TPU-native): 'cpu' forces the CPU "
                        "backend regardless of ambient JAX_PLATFORMS; 'tpu' "
                        "asserts an accelerator backend is live and errors "
                        "loudly otherwise; 'auto' (default) keeps the "
                        "ambient backend")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="--mode export: bake the int8 serving path into "
                        "the artifact (4x smaller params, dequant fused "
                        "into the exported StableHLO)")
    p.add_argument("--ood_detector", metavar="NPZ",
                   help="--mode export: bake this input_norm Mahalanobis "
                        "detector (the evaluate stage's "
                        "results/ood_detector.npz) into the artifact — the "
                        "exported program gains an ood_score output and the "
                        "manifest carries the is_ood threshold")
    p.add_argument("--ood_fpr", type=float, default=0.01,
                   help="--mode export: training-quantile false-positive "
                        "rate for the baked is_ood threshold")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s",
    )

    if args.platform == "cpu":
        # Must land before the first jax backend initialization. Setting
        # the env var alone is not enough when a sitecustomize registered
        # an accelerator plugin at interpreter start — override the jax
        # config too (same recipe as tests/conftest.py).
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        import jax

        plat = jax.devices()[0].platform
        if plat == "cpu":
            logger.error(
                "--platform tpu requested but only the CPU backend is "
                "available (jax.devices()[0].platform == 'cpu'); check "
                "JAX_PLATFORMS and the TPU runtime"
            )
            return 1
        logger.info("accelerator backend confirmed: %s", plat)

    if args.mode == "test":
        return 0 if run_component_tests() else 1

    if args.raw:
        summary = run_raw_pipeline(args)
        print(json.dumps(
            {"best_val_ccc": summary["best_val_ccc"],
             "test_ccc": summary["test"]["ccc_average"],
             "experiment_dir": summary["experiment_dir"]}, indent=2))
        return 0

    overrides = {}
    if args.epochs is not None:
        overrides["training.num_epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["training.batch_size"] = args.batch_size
    if args.learning_rate is not None:
        overrides["training.learning_rate"] = args.learning_rate
    if args.ensemble is not None:
        overrides["training.ensemble_members"] = args.ensemble

    pipeline = MultimodalDEERPipeline(
        config_path=args.config,
        output_dir=args.output_dir,
        experiment_name=args.experiment_name,
        overrides=overrides,
        quick=args.quick,
        resume=args.resume,
        recipe=args.recipe,
    )

    if args.mode == "full":
        summary = pipeline.run_full_pipeline()
        print(json.dumps(
            {"best_val_ccc": summary["best_val_ccc"],
             "experiment_dir": summary["experiment_dir"]}, indent=2))
    elif args.mode == "train":
        pipeline.create_model()
        pipeline.create_datasets()
        pipeline.create_trainer()
        results = pipeline.run_training()
        print(f"best val CCC: {results['best_val_ccc']:.4f}")
    elif args.mode == "evaluate":
        pipeline.create_model()
        pipeline.create_datasets()
        pipeline.create_trainer()
        if args.model_path:
            pipeline.load_checkpoint(args.model_path)
        results = pipeline.run_evaluation()
        print(json.dumps(results, indent=2))
    elif args.mode == "visualize":
        pipeline.create_model()
        pipeline.create_datasets()
        pipeline.create_trainer()
        if args.model_path:
            pipeline.load_checkpoint(args.model_path)
        plots = pipeline.run_visualization()
        print(json.dumps(plots, indent=2))
    elif args.mode == "export":
        # AOT serving artifact (tpu_deer/export.py): serialized StableHLO
        # per batch bucket + npz params + manifest — no reference
        # equivalent (its deployment story is "import torch and the repo").
        pipeline.create_model()
        params = pipeline.params
        serving_channel = "eabs"
        if args.model_path:
            from tpu_deer.train.checkpoint import CheckpointManager

            ckpt = CheckpointManager(args.model_path)
            step = (
                "best"
                if os.path.isdir(os.path.join(args.model_path, "best"))
                else None
            )
            params = ckpt.restore_params(params, step=step)
            # Bake the trainer's checkpoint-time channel selection into
            # the artifact (pre-selection checkpoints → the free channel).
            try:
                serving_channel = ckpt.metadata(step=step)["metrics"].get(
                    "serving_channel", "eabs"
                )
            except (OSError, KeyError, ValueError):
                pass
        from tpu_deer.export import export_inference

        ood_det = None
        if args.ood_detector:
            from tpu_deer.eval.ood import MahalanobisOOD

            ood_det = MahalanobisOOD.load(args.ood_detector)
        out_dir = os.path.join(args.output_dir, "exported_model")
        manifest = export_inference(
            pipeline.model, params, out_dir, quantize=args.int8,
            ensemble=getattr(pipeline, "ensemble_members", 1) > 1,
            ood_detector=ood_det, ood_fpr=args.ood_fpr,
            serving_channel=serving_channel,
        )
        print(json.dumps(
            {"export_dir": out_dir,
             **{k: manifest[k]
                for k in ("buckets", "platforms", "n_params", "quantized",
                          "ensemble_members", "serving_channel")}},
            indent=2,
        ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
