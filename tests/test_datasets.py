"""Dataset parser tests against fixture corpora written in the real formats."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from tpu_deer.data.features import (
    MultimodalFeatureExtractor,
    TextFeatureExtractor,
    VideoFeatureExtractor,
)

SR = 16000


def _write_wav(path, duration=0.5, freq=220.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(SR * duration)) / SR
    sig = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    wavfile.write(path, SR, sig)


@pytest.fixture(scope="module")
def extractor():
    return MultimodalFeatureExtractor()


@pytest.fixture(scope="module")
def iemocap_root(tmp_path_factory):
    """Minimal IEMOCAP tree: 2 sessions, 2 dialogs, 3 utterances each."""
    root = tmp_path_factory.mktemp("iemocap")
    for session, dialogs in ((1, ["Ses01F_impro01"]), (5, ["Ses05M_impro02"])):
        sdir = root / f"Session{session}"
        emo_dir = sdir / "dialog" / "EmoEvaluation"
        trans_dir = sdir / "dialog" / "transcriptions"
        emo_dir.mkdir(parents=True)
        trans_dir.mkdir(parents=True)
        for dialog in dialogs:
            lines, tlines = [], []
            for i, gender in enumerate("FMF"):
                utt = f"{dialog}_{gender}00{i}"
                t1, t2 = 1.0 * i, 1.0 * i + 0.8
                v, a, d = 2.5 + i * 0.5, 3.0, 2.0
                lines.append(
                    f"[{t1:.4f} - {t2:.4f}]\t{utt}\tneu\t[{v:.4f}, {a:.4f}, {d:.4f}]"
                )
                tlines.append(f"{utt} [{t1:.4f}-{t2:.4f}]: hello there friend")
                _write_wav(str(sdir / "sentences" / "wav" / dialog / f"{utt}.wav"))
            (emo_dir / f"{dialog}.txt").write_text("\n".join(lines))
            (trans_dir / f"{dialog}.txt").write_text("\n".join(tlines))
    return str(root)


@pytest.fixture(scope="module")
def ravdess_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ravdess")
    # actors 1 (train), 20 (val), 24 (test); emotions 3 (happy), 5 (angry)
    for actor in (1, 20, 24):
        for emotion in (3, 5):
            stem = f"03-01-{emotion:02d}-01-01-01-{actor:02d}"
            _write_wav(str(root / f"Actor_{actor:02d}" / f"{stem}.wav"))
    return str(root)


@pytest.fixture(scope="module")
def meld_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("meld")
    header = "Sr No.,Utterance,Speaker,Emotion,Sentiment,Dialogue_ID,Utterance_ID\n"
    rows = [
        '1,"I am so happy today!",Joey,joy,positive,0,0\n',
        '2,"This is terrible.",Ross,sadness,negative,0,1\n',
        '3,"Whatever.",Chandler,neutral,neutral,1,0\n',
    ]
    for name in ("train_sent_emo.csv", "dev_sent_emo.csv", "test_sent_emo.csv"):
        (root / name).write_text(header + "".join(rows))
    return str(root)


class TestIEMOCAP:
    def test_parse_and_split(self, iemocap_root, extractor):
        from tpu_deer.data.iemocap import load_iemocap

        splits = load_iemocap(iemocap_root, extractor=extractor)
        # session 5 → test
        assert len(splits["test"]) == 3
        # sessions 1-4 → train+val
        assert len(splits["train"]) + len(splits["val"]) == 3
        ds = splits["test"]
        assert ds.arrays["audio"].shape[1] == 84
        assert ds.arrays["video"].shape[1] == 256
        assert ds.arrays["text"].shape[1] == 768
        assert ds.arrays["labels"].shape[1] == 3
        # VAD normalized from 1..5 to [-1, 1]
        assert np.all(np.abs(ds.arrays["labels"]) <= 1.0)
        # audio features are real (non-zero)
        assert np.abs(ds.arrays["audio"]).sum() > 0
        assert np.abs(ds.arrays["text"]).sum() > 0

    def test_label_normalization(self, iemocap_root, extractor):
        from tpu_deer.data.iemocap import parse_annotations
        from pathlib import Path

        samples = parse_annotations(Path(iemocap_root))
        s0 = [s for s in samples if s["utt_id"].endswith("F000")][0]
        assert s0["valence"] == pytest.approx((2.5 - 3.0) / 2.0)
        assert s0["arousal"] == pytest.approx(0.0)

    def test_cache_roundtrip(self, iemocap_root, extractor):
        from tpu_deer.data.iemocap import load_iemocap

        a = load_iemocap(iemocap_root, extractor=extractor)
        b = load_iemocap(iemocap_root, extractor=extractor)  # from cache
        np.testing.assert_array_equal(
            a["test"].arrays["audio"], b["test"].arrays["audio"]
        )

    def test_auto_bootstrap_without_extractor(self, iemocap_root, tmp_path):
        """AUTO (no pretrain_text arg, no extractor, no BERT/encoder dirs):
        the loader MLM-pretrains the text backend itself instead of silently
        hashing (VERDICT r2 ask #4) and records which backend ran."""
        from tpu_deer.data.iemocap import load_iemocap

        cdir = str(tmp_path / "auto_cache")
        splits = load_iemocap(iemocap_root, cache_dir=cdir)
        assert splits["text_backend"] == "mlm"
        hashed = TextFeatureExtractor()._hashed("hello there friend")
        assert not np.allclose(splits["test"].arrays["text"][0], hashed)
        # Cache hit preserves the recorded backend.
        again = load_iemocap(iemocap_root, cache_dir=cdir)
        assert again["text_backend"] == "mlm"
        np.testing.assert_array_equal(
            splits["test"].arrays["text"], again["test"].arrays["text"]
        )

    def test_pretrain_text_opt_out(self, iemocap_root, tmp_path):
        """pretrain_text=False forces the hashed fallback and records it."""
        from tpu_deer.data.iemocap import load_iemocap

        cdir = str(tmp_path / "optout_cache")
        splits = load_iemocap(iemocap_root, cache_dir=cdir, pretrain_text=False)
        assert splits["text_backend"] == "hashed"
        hashed = TextFeatureExtractor()._hashed("hello there friend")
        np.testing.assert_allclose(
            splits["test"].arrays["text"][0], hashed, rtol=1e-5
        )

    def test_caller_extractor_respected_under_auto(self, iemocap_root, extractor, tmp_path):
        """A caller-provided extractor is an explicit backend choice: AUTO
        must not mutate it or pretrain behind its back."""
        from tpu_deer.data.iemocap import load_iemocap

        splits = load_iemocap(
            iemocap_root, extractor=extractor, cache_dir=str(tmp_path / "c")
        )
        assert splits["text_backend"] == "hashed"
        assert extractor.text.encoder is None

    def test_pretrain_text_backend(self, iemocap_root, tmp_path):
        """pretrain_text=True MLM-pretrains the text featurizer on the
        corpus' own transcripts and caches it — text features then come
        from the trained encoder, not hashing."""
        import os

        from tpu_deer.data.iemocap import load_iemocap

        cdir = str(tmp_path / "cache")
        splits = load_iemocap(iemocap_root, cache_dir=cdir, pretrain_text=True)
        ds = splits["test"]
        assert np.abs(ds.arrays["text"]).sum() > 0
        # The pretrained encoder was cached for reuse, keyed by the corpus
        # content (ADVICE r3: a quick-trained encoder must never be silently
        # reused by a full run).
        import glob

        assert glob.glob(
            os.path.join(cdir, "text_encoder_*", "encoder.msgpack")
        )
        # Features differ from the hashed baseline on the same transcripts.
        hashed = MultimodalFeatureExtractor().text.extract("hello there friend")
        assert not np.allclose(ds.arrays["text"][0], hashed)
        # Second load: dataset cache hit, identical features.
        again = load_iemocap(iemocap_root, cache_dir=cdir, pretrain_text=True)
        np.testing.assert_array_equal(
            ds.arrays["text"], again["test"].arrays["text"]
        )


class TestRAVDESS:
    def test_parse_and_split(self, ravdess_root, extractor):
        from tpu_deer.data.ravdess import load_ravdess

        splits = load_ravdess(ravdess_root, extractor=extractor)
        assert len(splits["train"]) == 2  # actor 1
        assert len(splits["val"]) == 2  # actor 20
        assert len(splits["test"]) == 2  # actor 24

    def test_correct_emotion_mapping(self, ravdess_root, extractor):
        """Code 03 must be happy (positive valence) — the reference's table
        had this wrong."""
        from tpu_deer.data.ravdess import EMOTION_VAD, parse_filename

        meta = parse_filename("03-01-03-01-01-01-01")
        assert meta["emotion"] == 3
        v, a, d = EMOTION_VAD[3]
        assert v > 0.5  # happy is positive-valence
        v5, a5, _ = EMOTION_VAD[5]
        assert v5 < 0 and a5 > 0.5  # angry: negative valence, high arousal

    def test_statement_text_features_differ(self, extractor):
        from tpu_deer.data.ravdess import STATEMENTS

        t1 = extractor.text.extract(STATEMENTS[1])
        t2 = extractor.text.extract(STATEMENTS[2])
        assert not np.allclose(t1, t2)


class TestMELD:
    def test_parse_csvs(self, meld_root, extractor):
        from tpu_deer.data.meld import load_meld

        splits = load_meld(meld_root, extractor=extractor)
        for split in ("train", "val", "test"):
            assert len(splits[split]) == 3
            assert splits[split].arrays["text"].shape == (3, 768)
        labels = splits["train"].arrays["labels"]
        # joy → positive valence; sadness → negative
        assert labels[0, 0] > 0.5
        assert labels[1, 0] < -0.5

    def test_meld_auto_bootstrap(self, meld_root, tmp_path):
        """MELD AUTO path: text featurizer MLM-pretrained on the train CSV's
        utterances, backend recorded."""
        from tpu_deer.data.meld import load_meld

        cdir = str(tmp_path / "meld_cache")
        splits = load_meld(meld_root, cache_dir=cdir)
        assert splits["text_backend"] == "mlm"
        hashed = TextFeatureExtractor()._hashed("I am so happy today!")
        assert not np.allclose(splits["train"].arrays["text"][0], hashed)
        import glob

        assert glob.glob(
            os.path.join(cdir, "text_encoder_*", "encoder.msgpack")
        )

    def test_dominance_not_degenerate(self, meld_root, extractor):
        from tpu_deer.data.meld import EMOTION_VAD

        doms = [v[2] for v in EMOTION_VAD.values()]
        assert np.std(doms) > 0  # reference hardcoded all-zero dominance


class TestFeatureExtractors:
    def test_text_hashing_deterministic(self):
        te = TextFeatureExtractor()
        a = te.extract("I am very happy today")
        b = te.extract("I am very happy today")
        np.testing.assert_array_equal(a, b)
        assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)

    def test_text_distinguishes_content(self):
        te = TextFeatureExtractor()
        a = te.extract("I am so happy and joyful")
        b = te.extract("I feel terrible and sad")
        assert np.dot(a, b) < 0.5

    def test_empty_text_is_zero(self):
        te = TextFeatureExtractor()
        assert np.abs(te.extract("")).sum() == 0

    def test_video_frame_features(self, rng):
        ve = VideoFeatureExtractor()
        frames = rng.random((8, 64, 64)).astype(np.float32)
        feat = ve.extract_from_frames(frames)
        assert feat.shape == (256,)
        assert np.all(np.isfinite(feat))

    def test_video_missing_file_zeros(self):
        ve = VideoFeatureExtractor()
        feat = ve.extract("/nonexistent/video.mp4")
        assert feat.shape == (256,)
        assert np.abs(feat).sum() == 0

    def test_audio_batch_bucketing(self, extractor, rng):
        sigs = [
            rng.normal(size=n).astype(np.float32)
            for n in (8000, 16000, 50000, 100000)
        ]
        feats = extractor.audio.extract_batch(sigs)
        assert feats.shape == (4, 84)
        assert np.all(np.isfinite(feats))


class TestRegistry:
    def test_load_configured(self, iemocap_root, meld_root):
        from tpu_deer.data.registry import load_configured_datasets

        config = {
            "datasets": {
                "names": ["IEMOCAP", "MELD", "RAVDESS"],
                "paths": {
                    "IEMOCAP": iemocap_root,
                    "MELD": meld_root,
                    "RAVDESS": "/nonexistent",
                },
            }
        }
        out = load_configured_datasets(config)
        assert out is not None
        assert set(out["train"].keys()) == {"iemocap", "meld"}
        # Registry surfaces per-corpus text-backend provenance; with no
        # BERT/encoder dirs configured, AUTO bootstraps MLM for the corpora
        # that have transcripts.
        backends = out["meta"]["text_backend"]
        assert backends["iemocap"] == "mlm"
        assert backends["meld"] == "mlm"

    def test_pretrain_text_false_in_config(self, iemocap_root):
        from tpu_deer.data.registry import load_configured_datasets

        config = {
            "datasets": {
                "names": ["IEMOCAP"],
                "paths": {"IEMOCAP": iemocap_root},
                "pretrain_text": False,
            }
        }
        out = load_configured_datasets(config)
        assert out["meta"]["text_backend"]["iemocap"] == "hashed"

    def test_no_paths_returns_none(self):
        from tpu_deer.data.registry import load_configured_datasets

        assert load_configured_datasets({"datasets": {"names": [], "paths": {}}}) is None


class TestLoaderFactory:
    def test_create_enhanced_dataloaders(self, iemocap_root, extractor):
        from tpu_deer.data.loaders import create_enhanced_dataloaders

        datasets, iterators = create_enhanced_dataloaders(
            iemocap_root, batch_size=2, dataset="iemocap", extractor=extractor
        )
        assert set(datasets) == {"train", "val", "test"}
        batch = next(iter(iterators["test"].epoch(0)))
        assert batch["audio"].shape == (2, 84)
        assert "mask" in batch

    def test_unknown_dataset_raises(self):
        from tpu_deer.data.loaders import create_enhanced_dataloaders

        import pytest as _pytest

        with _pytest.raises(ValueError):
            create_enhanced_dataloaders("/tmp", dataset="nope")


class TestTokenIds:
    def test_iemocap_emits_token_ids(self, iemocap_root, extractor, tmp_path):
        from tpu_deer.data.iemocap import load_iemocap

        splits = load_iemocap(
            iemocap_root, extractor=extractor, cache_dir=str(tmp_path)
        )
        ds = splits["test"]
        assert "token_ids" in ds.arrays
        assert ds.arrays["token_ids"].shape == (3, 128)
        assert ds.arrays["token_mask"].sum() > 0
        # Non-empty transcripts must produce non-trivial token sequences
        assert (ds.arrays["token_mask"].sum(axis=1) > 2).all()
