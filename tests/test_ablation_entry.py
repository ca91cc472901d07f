"""Tests for the ablation study, unified sequence encoder, and driver entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestAblation:
    def test_subsets_run_and_differ(self):
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
        from tpu_deer.eval.ablation import AblationStudy
        from tpu_deer.models.deer_model import DEERModelConfig
        from tpu_deer.train.trainer import TrainingConfig

        splits = make_synthetic_splits(
            SyntheticConfig(
                n_train=128, n_val=64, n_test=64, audio_dim=8, video_dim=8,
                text_dim=8, hard_fraction=0.0, label_noise=0.02,
            )
        )
        study = AblationStudy(
            DEERModelConfig(
                audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
                fusion_dim=32, attention_heads=2, encoder_layers=1,
            ),
            TrainingConfig(
                learning_rate=5e-3, batch_size=64, num_epochs=4,
                warmup_epochs=0, scheduler="constant",
            ),
            subsets=(("audio",), ("audio", "video", "text")),
        )
        results = study.run(
            ArrayDataset(splits["train"], "s"),
            ArrayDataset(splits["val"], "s"),
            num_epochs=4,
        )
        assert set(results) == {"A", "A+V+T"}
        # Trimodal must beat audio-only on this trimodal-signal data.
        assert (
            results["A+V+T"]["ccc_average"] > results["A"]["ccc_average"]
        ), results

    def test_masking_zeroes_only_excluded(self):
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.eval.ablation import _mask_modalities

        ds = ArrayDataset(
            {
                "audio": np.ones((4, 2), np.float32),
                "video": np.ones((4, 2), np.float32),
                "text": np.ones((4, 2), np.float32),
                "labels": np.ones((4, 3), np.float32),
            }
        )
        masked = _mask_modalities(ds, ("audio",))
        assert masked.arrays["audio"].sum() == 8
        assert masked.arrays["video"].sum() == 0
        assert masked.arrays["labels"].sum() == 12  # labels untouched


class TestUnifiedEncoder:
    def test_all_modalities(self, rng):
        from tpu_deer.models.encoders import UnifiedSequenceEncoder

        enc = UnifiedSequenceEncoder(output_dim=32, vocab_size=50)
        audio = jnp.asarray(rng.normal(size=(2, 6, 84)), dtype=jnp.float32)
        video = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 3)), dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, 50, size=(2, 5)), dtype=jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), audio, video, ids)["params"]
        out = enc.apply({"params": params}, audio, video, ids)
        assert out["audio"].shape == (2, 32)
        assert out["video"].shape == (2, 32)
        assert out["text"].shape == (2, 32)

    def test_subset_static(self, rng):
        from tpu_deer.models.encoders import UnifiedSequenceEncoder

        enc = UnifiedSequenceEncoder(output_dim=16, modalities=("audio",))
        audio = jnp.asarray(rng.normal(size=(2, 6, 84)), dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), audio)["params"]
        out = enc.apply({"params": params}, audio)
        assert set(out) == {"audio", "audio_attention"}


class TestGraftEntry:
    def test_entry_jits(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        mu, cal = jax.jit(fn)(*args)
        assert mu.shape == (8, 3)
        assert np.all(np.isfinite(np.asarray(mu)))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        ge.dryrun_multichip(2)
