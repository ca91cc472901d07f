"""Raw-sequence end-to-end: tokenizer + raw model trains with optax."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu_deer.core import losses as loss_lib
from tpu_deer.data.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer
from tpu_deer.models.hierarchical_deer import RawSequenceDEERModel


class TestHashTokenizer:
    def test_encode_structure(self):
        tok = HashTokenizer(vocab_size=1000, max_length=16)
        ids, mask = tok.encode("hello world")
        assert ids.shape == (16,)
        assert ids[0] == CLS_ID
        assert ids[3] == SEP_ID
        assert mask.sum() == 4  # CLS + 2 tokens + SEP
        assert np.all(ids[4:] == PAD_ID)

    def test_deterministic_and_in_range(self):
        tok = HashTokenizer(vocab_size=500, max_length=8)
        a, _ = tok.encode("the quick brown fox")
        b, _ = tok.encode("the quick brown fox")
        np.testing.assert_array_equal(a, b)
        assert np.all(a < 500)

    def test_truncation(self):
        tok = HashTokenizer(vocab_size=100, max_length=6)
        ids, mask = tok.encode("one two three four five six seven")
        assert mask.sum() == 6
        assert ids[-1] == SEP_ID

    def test_batch(self):
        tok = HashTokenizer(max_length=10)
        ids, mask = tok.encode_batch(["hi there", "bye"])
        assert ids.shape == (2, 10)
        assert mask.shape == (2, 10)


class TestRawEndToEnd:
    def test_raw_model_trains(self, rng):
        """A few optimizer steps on the raw-sequence model reduce the loss."""
        model = RawSequenceDEERModel(
            encoder_dim=24, fusion_dim=48, vocab_size=200, num_heads=4,
        )
        tok = HashTokenizer(vocab_size=200, max_length=8)
        n = 32
        audio = jnp.asarray(rng.normal(size=(n, 6, 84)), dtype=jnp.float32)
        video = jnp.asarray(rng.normal(size=(n, 2, 16, 16, 3)), dtype=jnp.float32)
        texts = ["happy day"] * (n // 2) + ["sad night"] * (n // 2)
        ids_np, mask_np = tok.encode_batch(texts)
        ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
        y = jnp.asarray(
            np.concatenate(
                [np.full((n // 2, 3), 0.5), np.full((n // 2, 3), -0.5)]
            ),
            dtype=jnp.float32,
        )

        params = model.init(jax.random.PRNGKey(0), audio, video, ids, mask)[
            "params"
        ]
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, audio, video, ids, mask
                )
                ps = [
                    out[f"{d}_params"]
                    for d in ("valence", "arousal", "dominance")
                ]
                return loss_lib.multi_task_deer_loss(ps, y)["total_loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(12):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]


class TestRawPipelineOnFixtureData:
    def test_iemocap_fixture_through_raw_model(self, tmp_path, rng):
        """Complete raw pipeline on real-format data: fixture IEMOCAP wavs →
        Pallas frame features + token ids → RawSequenceDEERModel forward."""
        import os

        from scipy.io import wavfile

        from tpu_deer.data.audio_io import load_wav
        from tpu_deer.data.iemocap import load_iemocap, parse_annotations
        from tpu_deer.data.features import MultimodalFeatureExtractor
        from tpu_deer.ops.audio_frontend import (
            AudioFrontendConfig,
            audio_frame_features,
        )

        # Build a 2-utterance fixture corpus.
        root = tmp_path / "iemocap"
        sdir = root / "Session1"
        (sdir / "dialog" / "EmoEvaluation").mkdir(parents=True)
        (sdir / "dialog" / "transcriptions").mkdir(parents=True)
        dialog = "Ses01F_impro01"
        lines, tlines = [], []
        for i in range(2):
            utt = f"{dialog}_F00{i}"
            lines.append(
                f"[{i}.0000 - {i}.8000]\t{utt}\tneu\t[3.0000, 3.0000, 3.0000]"
            )
            tlines.append(f"{utt} [{i}.0000-{i}.8000]: we are talking now")
            wav_dir = sdir / "sentences" / "wav" / dialog
            wav_dir.mkdir(parents=True, exist_ok=True)
            t = np.arange(8000) / 16000
            sig = (0.4 * np.sin(2 * np.pi * 200 * t) * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"{utt}.wav"), 16000, sig)
        (sdir / "dialog" / "EmoEvaluation" / f"{dialog}.txt").write_text(
            "\n".join(lines)
        )
        (sdir / "dialog" / "transcriptions" / f"{dialog}.txt").write_text(
            "\n".join(tlines)
        )

        splits = load_iemocap(
            str(root), cache_dir=str(tmp_path / "cache"),
            extractor=MultimodalFeatureExtractor(),
        )
        ds = splits["train"] if len(splits["train"]) else splits["val"]
        assert len(ds) == 2

        # Frame-level audio features from the raw wavs (the raw-model path).
        samples = parse_annotations(root)
        cfg = AudioFrontendConfig()
        frame_feats = jnp.stack(
            [
                audio_frame_features(
                    jnp.asarray(load_wav(s["wav"])), cfg, use_pallas=False
                )
                for s in samples
            ]
        )
        video = jnp.zeros((2, 2, 16, 16, 3), jnp.float32)
        ids = jnp.asarray(ds.arrays["token_ids"][:, :16])
        mask = jnp.asarray(ds.arrays["token_mask"][:, :16])

        model = RawSequenceDEERModel(
            encoder_dim=24, fusion_dim=48, vocab_size=30522, num_heads=4
        )
        params = model.init(
            jax.random.PRNGKey(0), frame_feats, video, ids, mask
        )["params"]
        out = model.apply({"params": params}, frame_feats, video, ids, mask)
        assert out["mu_all"].shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(out["mu_all"])))
