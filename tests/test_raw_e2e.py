"""Raw-media end-to-end slice: real-format corpus → in-graph Pallas
front-end → RawSequenceDEERModel training → nonzero CCC.

Covers the dataflow the reference sketches but never trains
(encoders.py:144-172, 418-459): .wav files, per-utterance frame arrays,
and transcripts with a real corpus vocabulary, through one jitted
waveform-to-gradient train step.
"""

import json
import os

import numpy as np
import pytest

from tpu_deer.data.raw_corpus import generate_raw_fixture, load_raw_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rawcorpus") / "iemocap_raw")
    generate_raw_fixture(root, n_train=96, n_val=24, n_test=24, seed=0)
    return root


class TestRawCorpus:
    def test_fixture_layout_is_real_format(self, corpus):
        """The fixture is parseable by the standard IEMOCAP parser."""
        from pathlib import Path

        from tpu_deer.data.iemocap import parse_annotations

        samples = parse_annotations(Path(corpus))
        assert len(samples) == 96 + 24 + 24
        s = samples[0]
        assert s["wav"] and s["wav"].endswith(".wav")
        assert s["text"]
        assert -1 <= s["valence"] <= 1

    def test_load_raw_corpus_shapes(self, corpus):
        splits, vocab = load_raw_corpus(corpus)
        assert set(splits) == {"train", "val", "test"}
        tr = splits["train"]
        n = len(tr["labels"])
        assert n == 96
        assert tr["signal"].shape == (n, 16000)
        assert tr["video_frames"].shape == (n, 4, 16, 16, 3)
        assert tr["token_ids"].shape[0] == n
        assert tr["labels"].shape == (n, 3)
        # Vocabulary is real (built from the transcripts), not hashed.
        assert vocab.token_id("wonderful") >= 5
        assert vocab.vocab_size < 100

    def test_media_carries_label_signal(self, corpus):
        """Sanity: generated audio energy correlates with arousal, frame
        brightness with valence — the labels are learnable from media."""
        splits, _ = load_raw_corpus(corpus)
        tr = splits["train"]
        energy = np.sqrt((tr["signal"] ** 2).mean(axis=1))
        brightness = tr["video_frames"].mean(axis=(1, 2, 3, 4))
        r_a = np.corrcoef(energy, tr["labels"][:, 1])[0, 1]
        r_v = np.corrcoef(brightness, tr["labels"][:, 0])[0, 1]
        assert r_a > 0.7, r_a
        assert r_v > 0.7, r_v


class TestRawEndToEndTraining:
    def test_trains_to_nonzero_ccc(self, corpus):
        """Waveform-to-gradient training reaches a clearly nonzero CCC."""
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

        splits, vocab = load_raw_corpus(corpus)
        tr = splits["train"]
        fcfg = AudioFrontendConfig()
        model = RawSequenceDEERModel(
            encoder_dim=48, fusion_dim=96, vocab_size=vocab.vocab_size,
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
            RawTrainingConfig(
                learning_rate=2e-3, batch_size=32, num_epochs=10,
            ),
            frontend_config=fcfg,
        )
        results = trainer.train(tr, splits["val"])
        assert results["best_val_ccc"] > 0.2, results["history"]["val_ccc"]

        pred = trainer.predict(splits["test"])
        assert pred["mu"].shape == (24, 3)
        assert np.all(np.isfinite(pred["mu"]))
        assert np.all(pred["uncertainty"] > 0)


class TestRawCLI:
    def test_cli_raw_flag(self, tmp_path):
        """--raw drives the whole slice from the CLI and writes artifacts."""
        from tpu_deer.cli import main

        out = str(tmp_path / "exp")
        rc = main([
            "--raw", "--quick", "--output_dir", out,
            "--experiment_name", "raw_e2e", "--epochs", "8",
        ])
        assert rc == 0
        results_path = os.path.join(out, "raw_e2e", "results", "raw_results.json")
        assert os.path.exists(results_path)
        with open(results_path) as f:
            payload = json.load(f)
        assert payload["best_val_ccc"] > 0.1
        assert payload["test"]["ccc_average"] == pytest.approx(
            payload["test"]["ccc_average"]
        )
        # Fixture corpus was generated in the experiment dir (loud fallback).
        assert os.path.isdir(payload["raw_root"])
