"""Benchmark v2 generator tests (data/synthetic.py:labels_from_latent).

Round-3 VERDICT task 5: the v1 fixture's dense feature->label projections
left the 256-d video channel sample-starved (V-only CCC 0.053 in the round-2
ablation) and tied hardness to audio features only. v2 drives labels from a
shared latent with per-modality partial observability; these tests pin the
properties the ablation/fusion/ensemble studies rely on.
"""

import numpy as np
import pytest

from tpu_deer.data.synthetic import (
    SyntheticConfig,
    benchmark_v2,
    make_synthetic_splits,
    visible_latent_dims,
)


def _ccc(y, p):
    cov = ((y - y.mean()) * (p - p.mean())).mean()
    return 2 * cov / (y.var() + p.var() + (y.mean() - p.mean()) ** 2)


def _ridge_ccc(train, test, keys, lam=10.0):
    X = np.concatenate([train[k] for k in keys], axis=1)
    Xt = np.concatenate([test[k] for k in keys], axis=1)
    W = np.linalg.solve(
        X.T @ X + lam * np.eye(X.shape[1]), X.T @ train["labels"]
    )
    pred = Xt @ W
    return float(
        np.mean([_ccc(test["labels"][:, d], pred[:, d]) for d in range(3)])
    )


@pytest.fixture(scope="module")
def v2_splits():
    return make_synthetic_splits(benchmark_v2(n_train=8192, n_test=2048))


class TestVisibleLatentDims:
    def test_union_covers_latent(self):
        for L in (6, 12, 24, 48):
            vis = visible_latent_dims(L)
            union = np.unique(
                np.concatenate([vis["audio"], vis["video"], vis["text"]])
            )
            assert union.tolist() == list(range(L))

    def test_core_visible_to_all(self):
        vis = visible_latent_dims(24)
        for m in ("audio", "video", "text"):
            assert set(vis["core"]) <= set(vis[m])

    def test_gradation(self):
        vis = visible_latent_dims(24)
        assert len(vis["video"]) < len(vis["audio"]) < len(vis["text"])


class TestBenchmarkV2:
    def test_requires_latent_dim(self):
        cfg = SyntheticConfig(labels_from_latent=True, latent_dim=None)
        with pytest.raises(ValueError, match="latent_dim"):
            make_synthetic_splits(cfg)

    def test_deterministic(self):
        a = make_synthetic_splits(benchmark_v2(n_train=256))
        b = make_synthetic_splits(benchmark_v2(n_train=256))
        for k in ("audio", "video", "labels", "is_hard"):
            np.testing.assert_array_equal(a["train"][k], b["train"][k])

    def test_hard_fraction_realized(self, v2_splits):
        frac = v2_splits["train"]["is_hard"].mean()
        assert 0.25 < frac < 0.35  # config says 0.3

    def test_every_modality_carries_signal(self, v2_splits):
        tr, te = v2_splits["train"], v2_splits["test"]
        cccs = {
            m: _ridge_ccc(tr, te, (m,)) for m in ("audio", "video", "text")
        }
        # The round-2 failure mode was V ~= 0.05; v2 must give video a real
        # floor, and text > audio > video by construction.
        assert cccs["video"] > 0.3, cccs
        assert cccs["text"] > cccs["audio"] > cccs["video"], cccs

    def test_fusion_beats_single_modalities(self, v2_splits):
        tr, te = v2_splits["train"], v2_splits["test"]
        all3 = _ridge_ccc(tr, te, ("audio", "video", "text"))
        best_single = max(
            _ridge_ccc(tr, te, (m,)) for m in ("audio", "video", "text")
        )
        assert all3 > best_single + 0.03

    def test_hardness_learnable_from_video_alone(self, v2_splits):
        # Hardness lives on the core latent dims every modality observes.
        tr, te = v2_splits["train"], v2_splits["test"]
        y = tr["is_hard"] * 2 - 1
        W = np.linalg.solve(
            tr["video"].T @ tr["video"] + 10 * np.eye(tr["video"].shape[1]),
            tr["video"].T @ y,
        )
        score = te["video"] @ W
        pos, neg = score[te["is_hard"] > 0.5], score[te["is_hard"] < 0.5]
        ranks = np.argsort(np.argsort(np.concatenate([neg, pos]))) + 1
        auc = (ranks[len(neg):].sum() - len(pos) * (len(pos) + 1) / 2) / (
            len(pos) * len(neg)
        )
        assert auc > 0.9, auc

    def test_generative_ground_truth_exposed(self, v2_splits):
        te = v2_splits["test"]
        assert te["signal"].shape == te["labels"].shape
        assert set(np.unique(te["noise_scale"])) == {
            np.float32(0.05), np.float32(0.4),
        }
        # signal is the pre-noise label (labels = tanh(signal + noise), so
        # even easy samples carry a small tanh-recompression offset).
        easy = te["is_hard"] < 0.5
        easy_err = np.abs(te["labels"][easy] - te["signal"][easy]).mean()
        hard_err = np.abs(te["labels"][~easy] - te["signal"][~easy]).mean()
        assert easy_err < 0.15
        assert hard_err > easy_err + 0.05

    def test_v1_unchanged(self):
        # The default (v1) generator must stay bit-identical — committed
        # artifacts (headline npz, conformal study) depend on it.
        s = make_synthetic_splits(SyntheticConfig(n_train=64, n_val=8, n_test=8))
        assert "signal" not in s["train"]
        assert float(s["train"]["audio"][0, 0]) == pytest.approx(
            0.30471707975443135, rel=1e-6
        )
