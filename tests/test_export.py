"""AOT export tests: serialize -> deserialize -> numerical identity."""

import json
import os

import numpy as np
import pytest

from tpu_deer.export import export_inference, load_exported
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model

SMALL = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=1, dropout=0.1,
)


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    model, params = create_complete_deer_model(SMALL, seed=0)
    out = str(tmp_path_factory.mktemp("export"))
    manifest = export_inference(
        model, params, out, batch_buckets=(1, 4, 8)
    )
    return out, model, params, manifest


class TestExport:
    def test_manifest_and_files(self, artifact_dir):
        out, _, _, manifest = artifact_dir
        assert manifest["format"] == "tpu_deer.export.v1"
        assert manifest["buckets"] == [1, 4, 8]
        assert os.path.exists(os.path.join(out, "manifest.json"))
        assert os.path.exists(os.path.join(out, "params.npz"))
        for name in manifest["artifacts"].values():
            assert os.path.getsize(os.path.join(out, name)) > 0
        # No pickle anywhere in the artifact.
        with open(os.path.join(out, "manifest.json")) as f:
            json.load(f)

    def test_roundtrip_matches_live_forward(self, artifact_dir):
        out, model, params, _ = artifact_dir
        engine = load_exported(out)
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 16)).astype(np.float32)
        got = engine.predict(a, a, a)
        ref = model.apply({"params": params}, a, a, a, deterministic=True)
        np.testing.assert_allclose(
            got["mu"], np.asarray(ref["mu_all"]), atol=1e-6
        )
        np.testing.assert_allclose(
            got["calibrated_uncertainty"],
            np.asarray(ref["calibrated_uncertainty"]), atol=1e-6,
        )
        # The closed-form E|err| channel is part of the artifact (computed
        # in-graph from the NIG params) and the manifest records which
        # channel deployment should read.
        from tpu_deer.core.nig import nig_expected_abs_error

        eabs_ref = np.concatenate(
            [
                np.asarray(nig_expected_abs_error(ref[f"{n}_params"]))
                for n in model.config.dim_names
            ],
            axis=-1,
        )
        np.testing.assert_allclose(
            got["expected_abs_error"], eabs_ref, rtol=1e-5, atol=1e-5
        )
        assert engine.serving_channel == "eabs"

    def test_padding_and_chunking(self, artifact_dir):
        out, model, params, _ = artifact_dir
        engine = load_exported(out)
        rng = np.random.default_rng(1)
        # 3 pads up to bucket 4; 19 chunks over the max bucket 8.
        for n in (3, 19):
            a = rng.standard_normal((n, 16)).astype(np.float32)
            got = engine.predict(a, a, a)
            assert got["mu"].shape == (n, 3)
            ref = model.apply({"params": params}, a, a, a, deterministic=True)
            np.testing.assert_allclose(
                got["mu"], np.asarray(ref["mu_all"]), atol=1e-5
            )

    def test_multiplatform_lowering(self, tmp_path):
        """One artifact lowered for cpu AND tpu still runs on the cpu host."""
        model, params = create_complete_deer_model(SMALL, seed=0)
        out = str(tmp_path / "multi")
        manifest = export_inference(
            model, params, out, batch_buckets=(4,), platforms=("cpu", "tpu")
        )
        assert manifest["platforms"] == ["cpu", "tpu"]
        engine = load_exported(out)
        a = np.zeros((4, 16), np.float32)
        assert engine.predict(a, a, a)["mu"].shape == (4, 3)

    def test_bad_format_rejected(self, tmp_path):
        d = tmp_path / "bogus"
        d.mkdir()
        (d / "manifest.json").write_text(json.dumps({"format": "other"}))
        with pytest.raises(ValueError, match="unrecognized export format"):
            load_exported(str(d))


class TestQuantizedExport:
    @pytest.fixture(scope="class")
    def q_artifact(self, tmp_path_factory):
        model, params = create_complete_deer_model(SMALL, seed=0)
        out = str(tmp_path_factory.mktemp("export_q"))
        manifest = export_inference(
            model, params, out, batch_buckets=(1, 4), quantize=True
        )
        return out, model, params, manifest

    def test_artifact_is_smaller_and_flagged(self, q_artifact, tmp_path):
        out, model, params, manifest = q_artifact
        assert manifest["quantized"] is True
        f32_dir = str(tmp_path / "f32")
        export_inference(model, params, f32_dir, batch_buckets=(1, 4))
        q_size = os.path.getsize(os.path.join(out, "params.npz"))
        f_size = os.path.getsize(os.path.join(f32_dir, "params.npz"))
        # This tiny test config has proportionally more non-quantizable
        # leaves (biases/norms/<8-row kernels stay f32) than the flagship,
        # so the bound is looser here; the flagship payload shrinks ~4x.
        assert q_size < 0.55 * f_size

    def test_roundtrip_close_to_float(self, q_artifact, rng):
        out, model, params, _ = q_artifact
        import jax.numpy as jnp

        engine = load_exported(out)
        a, v, t = (rng.normal(size=(4, 16)).astype(np.float32)
                   for _ in range(3))
        got = engine.predict(a, v, t)
        ref = model.apply(
            {"params": params},
            jnp.asarray(a), jnp.asarray(v), jnp.asarray(t),
            deterministic=True,
        )
        np.testing.assert_allclose(
            got["mu"], np.asarray(ref["mu_all"]), atol=0.05
        )
        # int8 payload actually landed in the artifact
        flat = dict(np.load(os.path.join(out, "params.npz")))
        assert any(val.dtype == np.int8 for val in flat.values())


class TestOODExport:
    @pytest.fixture(scope="class")
    def detector(self):
        from tpu_deer.eval.ood import MahalanobisOOD

        rng = np.random.default_rng(5)
        mods = [rng.normal(size=(512, 16)).astype(np.float32)
                for _ in range(3)]
        return MahalanobisOOD().fit_modalities(*mods)

    def test_exported_ood_matches_host_detector(self, tmp_path, detector, rng):
        model, params = create_complete_deer_model(SMALL, seed=0)
        out = str(tmp_path / "ood_art")
        manifest = export_inference(
            model, params, out, batch_buckets=(1, 4),
            ood_detector=detector, ood_fpr=0.05,
        )
        assert manifest["outputs"][-1] == "ood_score"
        assert manifest["ood"]["space"] == "input_norm"
        assert manifest["ood"]["threshold"] == pytest.approx(
            detector.threshold(0.05)
        )
        engine = load_exported(out)
        req = [rng.standard_normal((3, 16)).astype(np.float32)
               for _ in range(3)]
        got = engine.predict(*req)
        np.testing.assert_allclose(
            got["ood_score"], detector.score_modalities(*req), rtol=5e-4
        )
        np.testing.assert_array_equal(
            got["is_ood"], got["ood_score"] > detector.threshold(0.05)
        )
        # gain invariance survives serialization
        got2 = engine.predict(*[r * 6.0 for r in req])
        np.testing.assert_allclose(
            got2["ood_score"], got["ood_score"], rtol=1e-3
        )

    def test_ood_composes_with_ensemble(self, tmp_path, detector, rng):
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        out = str(tmp_path / "ood_ens")
        export_inference(
            model, stacked, out, batch_buckets=(2,), ensemble=True,
            ood_detector=detector,
        )
        req = [rng.standard_normal((2, 16)).astype(np.float32)
               for _ in range(3)]
        got = load_exported(out).predict(*req)
        np.testing.assert_allclose(
            got["ood_score"], detector.score_modalities(*req), rtol=5e-4
        )
        assert "is_ood" in got

    def test_fused_space_detector_rejected(self, tmp_path, rng):
        from tpu_deer.eval.ood import MahalanobisOOD

        det = MahalanobisOOD().fit(rng.normal(size=(64, 8)))
        model, params = create_complete_deer_model(SMALL, seed=0)
        with pytest.raises(ValueError, match="input_norm"):
            export_inference(
                model, params, str(tmp_path / "x"), batch_buckets=(1,),
                ood_detector=det,
            )


class TestEnsembleExport:
    def test_exported_ensemble_matches_live_engine(self, tmp_path, rng):
        """Exported stacked-ensemble artifact == the live-jit ensemble
        engine's moment-matched outputs, loaded without model code."""
        from tpu_deer.serve import InferenceEngine
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(SMALL, n_members=3, seed=0)
        out = str(tmp_path / "ens_art")
        manifest = export_inference(
            model, stacked, out, batch_buckets=(1, 4), ensemble=True
        )
        assert manifest["ensemble_members"] == 3

        engine = load_exported(out)
        live = InferenceEngine(
            model, stacked, batch_buckets=(1, 4), ensemble=True
        )
        a = rng.standard_normal((3, 16)).astype(np.float32)
        v = rng.standard_normal((3, 16)).astype(np.float32)
        t = rng.standard_normal((3, 16)).astype(np.float32)
        got = engine.predict(a, v, t)
        want = live.predict(a, v, t)
        np.testing.assert_allclose(got["mu"], want["mu"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            got["uncertainty"], want["uncertainty"], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            got["calibrated_uncertainty"], want["calibrated_uncertainty"],
            rtol=1e-4, atol=1e-6,
        )

    def test_int8_ensemble_export(self, tmp_path, rng):
        """int8 + ensemble compose: the artifact carries stacked int8
        kernels with per-member scales, and the loaded engine stays within
        quantization noise of the float ensemble artifact."""
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        f_dir, q_dir = str(tmp_path / "f"), str(tmp_path / "q")
        export_inference(model, stacked, f_dir, batch_buckets=(4,),
                         ensemble=True)
        manifest = export_inference(model, stacked, q_dir, batch_buckets=(4,),
                                    ensemble=True, quantize=True)
        assert manifest["quantized"] and manifest["ensemble_members"] == 2
        a = rng.standard_normal((4, 16)).astype(np.float32)
        f_out = load_exported(f_dir).predict(a, a, a)
        q_out = load_exported(q_dir).predict(a, a, a)
        np.testing.assert_allclose(q_out["mu"], f_out["mu"], atol=0.05)
