"""RAVDESS and MELD raw-media layouts through the raw-sequence path.

The reference parses these layouts but fills the non-audio channels with
np.random placeholders (multi_dataset_framework.py:263-358). Here the real
media flows: filename-coded wavs + frame sidecars (RAVDESS), CSV + media
dirs (MELD), plus a joint multi-corpus combination over a shared vocabulary.
"""

import numpy as np
import pytest

from tpu_deer.data.raw_corpus import (
    combine_raw_splits,
    generate_raw_fixture,
    generate_raw_fixture_meld,
    generate_raw_fixture_ravdess,
    load_raw_corpus,
    load_raw_meld,
    load_raw_ravdess,
    merge_vocabs,
)


@pytest.fixture(scope="module")
def ravdess_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rawrav") / "ravdess_raw")
    generate_raw_fixture_ravdess(root, n_per_actor=4, seed=0)
    return root


@pytest.fixture(scope="module")
def meld_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rawmeld") / "meld_raw")
    generate_raw_fixture_meld(root, n_train=48, n_val=16, n_test=16, seed=0)
    return root


class TestRavdessRawLayout:
    def test_fixture_is_real_format(self, ravdess_root):
        """Filenames parse with the standard RAVDESS code parser."""
        from pathlib import Path

        from tpu_deer.data.ravdess import parse_filename

        wavs = sorted(Path(ravdess_root).rglob("*.wav"))
        assert len(wavs) == 24 * 4
        metas = [parse_filename(w.stem) for w in wavs]
        assert all(m is not None for m in metas)
        assert {m["actor"] for m in metas} == set(range(1, 25))
        # Every wav has a decoded-frames sidecar.
        assert all(w.with_suffix(".npy").exists() for w in wavs)

    def test_loader_splits_by_actor(self, ravdess_root):
        splits, vocab = load_raw_ravdess(ravdess_root)
        assert set(splits) == {"train", "val", "test"}
        assert len(splits["train"]["labels"]) == 18 * 4
        assert len(splits["val"]["labels"]) == 3 * 4
        assert len(splits["test"]["labels"]) == 3 * 4
        tr = splits["train"]
        assert tr["signal"].shape[1] == 16000
        assert tr["video_frames"].shape[1:] == (4, 16, 16, 3)
        # Text is the two fixed statements — tiny real vocabulary.
        assert vocab.token_id("kids") >= 5
        assert vocab.token_id("dogs") >= 5

    def test_media_carries_label_signal(self, ravdess_root):
        splits, _ = load_raw_ravdess(ravdess_root)
        tr = splits["train"]
        energy = np.sqrt((tr["signal"] ** 2).mean(axis=1))
        brightness = tr["video_frames"].mean(axis=(1, 2, 3, 4))
        assert np.corrcoef(energy, tr["labels"][:, 1])[0, 1] > 0.7
        assert np.corrcoef(brightness, tr["labels"][:, 0])[0, 1] > 0.7
        # Dominance is NOT degenerate (the reference hardcodes it to 0).
        assert tr["labels"][:, 2].std() > 0.1


class TestMeldRawLayout:
    def test_fixture_is_real_format(self, meld_root):
        """CSVs parse with the standard MELD reader; media dirs exist."""
        from pathlib import Path

        from tpu_deer.data.meld import SPLIT_FILES, _read_csv

        for split, (csv_name, media_dir) in SPLIT_FILES.items():
            rows = _read_csv(Path(meld_root) / csv_name)
            assert rows and {"Utterance", "Emotion"} <= set(rows[0])
            assert (Path(meld_root) / media_dir).is_dir()

    def test_loader_follows_csv_splits(self, meld_root):
        splits, vocab = load_raw_meld(meld_root)
        assert len(splits["train"]["labels"]) == 48
        assert len(splits["val"]["labels"]) == 16
        assert len(splits["test"]["labels"]) == 16
        # Utterance text is real (template words present in every row).
        assert vocab.token_id("honestly") >= 5

    def test_media_carries_label_signal(self, meld_root):
        splits, _ = load_raw_meld(meld_root)
        tr = splits["train"]
        energy = np.sqrt((tr["signal"] ** 2).mean(axis=1))
        assert np.corrcoef(energy, tr["labels"][:, 1])[0, 1] > 0.7

    def test_missing_media_zero_filled_not_random(self, tmp_path, caplog):
        """A CSV row without media loads with a zero (not noise) channel."""
        import logging

        root = str(tmp_path / "meld_nomedia")
        generate_raw_fixture_meld(root, n_train=8, n_val=4, n_test=4, seed=1)
        # Delete one train wav to simulate missing media.
        from pathlib import Path

        victim = sorted((Path(root) / "train_splits").glob("*.wav"))[0]
        victim.unlink()
        with caplog.at_level(logging.WARNING):
            splits, _ = load_raw_meld(root)
        assert any("no wav" in r.message for r in caplog.records)
        tr = splits["train"]
        silent = np.abs(tr["signal"]).max(axis=1) == 0
        assert silent.sum() == 1


class TestJointRawCorpus:
    def test_combine_over_shared_vocab(self, ravdess_root, meld_root, tmp_path):
        iem_root = str(tmp_path / "iem_raw")
        generate_raw_fixture(iem_root, n_train=24, n_val=8, n_test=8, seed=2)
        # Pass 1: per-corpus vocabs; pass 2: reload under the merged vocab.
        per = {
            "iemocap": load_raw_corpus(iem_root),
            "ravdess": load_raw_ravdess(ravdess_root),
            "meld": load_raw_meld(meld_root),
        }
        shared = merge_vocabs([v for _, v in per.values()])
        corpora = {
            "iemocap": load_raw_corpus(iem_root, vocab=shared)[0],
            "ravdess": load_raw_ravdess(ravdess_root, vocab=shared)[0],
            "meld": load_raw_meld(meld_root, vocab=shared)[0],
        }
        joint = combine_raw_splits(corpora)
        n_train = sum(len(c["train"]["labels"]) for c in corpora.values())
        assert len(joint["train"]["labels"]) == n_train
        assert joint["train"]["dataset_id"].min() == 0
        assert joint["train"]["dataset_id"].max() == 2
        # dataset_id order is sorted corpus names: iemocap=0, meld=1,
        # ravdess=2 — the per-corpus block sizes must match.
        sizes = np.bincount(joint["train"]["dataset_id"], minlength=3)
        assert sizes[0] == len(corpora["iemocap"]["train"]["labels"])
        assert sizes[1] == len(corpora["meld"]["train"]["labels"])
        assert sizes[2] == len(corpora["ravdess"]["train"]["labels"])
        # Shared vocab covers corpus-specific words from all three.
        assert shared.token_id("kids") >= 5       # RAVDESS statement
        assert shared.token_id("honestly") >= 5   # MELD utterance template

    def test_joint_trains_to_nonzero_ccc(self, ravdess_root, meld_root, tmp_path):
        """One model trains on the concatenated three-layout corpus."""
        import jax
        import jax.numpy as jnp

        from tpu_deer.models.hierarchical_deer import RawSequenceDEERModel
        from tpu_deer.ops.audio_frontend import (
            AudioFrontendConfig,
            audio_frame_features,
        )
        from tpu_deer.train.raw_trainer import (
            RawSequenceTrainer,
            RawTrainingConfig,
        )

        iem_root = str(tmp_path / "iem_raw")
        generate_raw_fixture(iem_root, n_train=24, n_val=8, n_test=8, seed=3)
        shared = merge_vocabs([
            load_raw_corpus(iem_root)[1],
            load_raw_ravdess(ravdess_root)[1],
            load_raw_meld(meld_root)[1],
        ])
        joint = combine_raw_splits({
            "iemocap": load_raw_corpus(iem_root, vocab=shared)[0],
            "ravdess": load_raw_ravdess(ravdess_root, vocab=shared)[0],
            "meld": load_raw_meld(meld_root, vocab=shared)[0],
        })
        tr = joint["train"]
        fcfg = AudioFrontendConfig()
        model = RawSequenceDEERModel(
            encoder_dim=48, fusion_dim=96, vocab_size=shared.vocab_size,
            num_heads=4, dropout=0.1,
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
            RawTrainingConfig(learning_rate=2e-3, batch_size=32,
                              num_epochs=10),
            frontend_config=fcfg,
        )
        results = trainer.train(tr, joint["val"])
        assert results["best_val_ccc"] > 0.2, results["history"]["val_ccc"]


class TestRawCLILayouts:
    @pytest.mark.parametrize("layout", ["ravdess", "meld"])
    def test_cli_raw_dataset_flag(self, tmp_path, layout):
        import json
        import os

        from tpu_deer.cli import main

        out = str(tmp_path / "exp")
        rc = main([
            "--raw", "--quick", "--raw_dataset", layout,
            "--output_dir", out, "--experiment_name", f"raw_{layout}",
            "--epochs", "6",
        ])
        assert rc == 0
        results_path = os.path.join(
            out, f"raw_{layout}", "results", "raw_results.json"
        )
        with open(results_path) as f:
            payload = json.load(f)
        assert payload["raw_layout"] == layout
        assert np.isfinite(payload["best_val_ccc"])
