"""HTTP serving endpoint: in-process server over an AOT artifact."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tpu_deer.export import export_inference
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.server import PredictionService, serve

SMALL = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=1, dropout=0.1,
)


@pytest.fixture(scope="module")
def running_server(tmp_path_factory):
    model, params = create_complete_deer_model(SMALL, seed=0)
    art = str(tmp_path_factory.mktemp("srv"))
    export_inference(model, params, art, batch_buckets=(1, 4))
    service = PredictionService.from_exported(art)
    server = serve(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", service
    server.shutdown()


def _post_path(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _post(url, payload):
    return _post_path(url, "/predict", payload)


class TestServer:
    def test_healthz(self, running_server):
        url, _ = running_server
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            data = json.loads(r.read())
        assert data["status"] == "ok"

    def test_predict_roundtrip(self, running_server):
        url, service = running_server
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((3, 16)).tolist()
        out = _post(url, {"audio": feats, "video": feats, "text": feats})
        assert np.asarray(out["mu"]).shape == (3, 3)
        assert np.all(np.isfinite(np.asarray(out["calibrated_uncertainty"])))
        assert service.requests_served >= 1
        # Responses name the checkpoint-selected channel and alias it so
        # clients need no mapping logic.
        assert out["serving_channel"] in ("calibrated", "eabs")
        alias = (
            "calibrated_uncertainty"
            if out["serving_channel"] == "calibrated"
            else "expected_abs_error"
        )
        assert out["deployable_uncertainty"] == out[alias]

    def test_single_sample_1d(self, running_server):
        url, _ = running_server
        row = [0.0] * 16
        out = _post(url, {"audio": row, "video": row, "text": row})
        assert np.asarray(out["mu"]).shape == (1, 3)

    def test_conformal_intervals_in_response(self, running_server, tmp_path):
        """--conformal spec makes /predict return calibrated intervals whose
        half-width is quantile * sqrt(uncertainty) around mu."""
        url, service = running_server
        spec_path = tmp_path / "conformal.json"
        # CLI-report shape (per-dataset dict) to exercise the loader
        spec_path.write_text(json.dumps({"synthetic": {
            "alpha": 0.1, "normalized": True, "quantiles": [1.5, 2.0, 2.5],
        }}))
        service.conformal = PredictionService.load_conformal(str(spec_path))
        try:
            rng = np.random.default_rng(1)
            feats = rng.standard_normal((2, 16)).tolist()
            out = _post(url, {"audio": feats, "video": feats, "text": feats})
            mu = np.asarray(out["mu"])
            lo = np.asarray(out["interval_lower"])
            hi = np.asarray(out["interval_upper"])
            sig = np.sqrt(np.asarray(out["uncertainty"]))
            assert out["interval_alpha"] == 0.1
            np.testing.assert_allclose(
                hi - lo, 2.0 * sig * np.array([1.5, 2.0, 2.5]), rtol=1e-5)
            np.testing.assert_allclose((hi + lo) / 2.0, mu, atol=1e-6)
        finally:
            service.conformal = None

    def test_conformal_loader_rejects_inf_quantiles(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps(
            {"alpha": 0.01, "normalized": True,
             "quantiles": [1.0, float("inf"), 1.0]}))
        with pytest.raises(ValueError, match="non-finite"):
            PredictionService.load_conformal(str(p))

    def test_validation_errors(self, running_server):
        url, _ = running_server
        row = [0.0] * 16
        bad_dim = [0.0] * 7
        for payload, msg in [
            ({"audio": row, "video": row}, "missing field 'text'"),
            ({"audio": bad_dim, "video": row, "text": row}, "must be"),
            ({"audio": [row, row], "video": row, "text": row}, "batch size"),
            ({"audio": [float("nan")] * 16, "video": row, "text": row},
             "non-finite"),
        ]:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(url, payload)
            assert e.value.code == 400
            assert msg in json.loads(e.value.read())["error"]

    def test_burst_connects_all_succeed(self, running_server):
        """32 clients connecting in the same instant must all be served:
        socketserver's default listen backlog (5) reset connections under
        burst connects (measured in experiments/server_load.py at 16
        clients); server._Server sizes it at 128."""
        url, _ = running_server
        row = [0.0] * 16
        payload = {"audio": row, "video": row, "text": row}
        n = 32
        barrier = threading.Barrier(n)
        errors, oks = [], []

        def worker():
            try:
                barrier.wait()
                out = _post(url, payload)
                oks.append(out)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors[:3]
        assert len(oks) == n

    def test_unknown_path_404(self, running_server):
        url, _ = running_server
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(url + "/nope", timeout=30)
        assert e.value.code == 404

    def test_pre_upgrade_artifact_still_honors_contract(self, tmp_path):
        """A 3-output artifact exported before the E|err| channel existed
        must still serve a present, honestly-labeled deployable_uncertainty
        (fallback: calibrated), not silently omit the documented keys."""
        model, params = create_complete_deer_model(SMALL, seed=0)
        art = str(tmp_path / "old_art")
        export_inference(model, params, art, batch_buckets=(4,))
        # Rewind the manifest to the pre-upgrade shape: no E|err| output,
        # no serving_channel selection recorded.
        mpath = art + "/manifest.json"
        with open(mpath) as f:
            manifest = json.load(f)
        manifest["outputs"] = [
            n for n in manifest["outputs"] if n != "expected_abs_error"
        ]
        manifest.pop("serving_channel", None)
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        service = PredictionService.from_exported(art)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((2, 16)).tolist()
        out = service.predict_json(
            {"audio": feats, "video": feats, "text": feats}
        )
        assert "expected_abs_error" not in out
        assert out["serving_channel"] == "calibrated"
        assert out["deployable_uncertainty"] == out["calibrated_uncertainty"]


class _FakeEngine:
    """Records per-dispatch batch sizes; returns row-identifying outputs."""

    def __init__(self):
        self.calls = []

    def predict(self, a, v, t):
        self.calls.append(len(a))
        return {"mu": np.repeat(a[:, :1], 3, axis=1)}


class TestMicroBatcher:
    def test_coalesces_queued_requests(self):
        from tpu_deer.server import MicroBatcher

        eng = _FakeEngine()
        mb = MicroBatcher(eng, max_batch=64, max_wait_ms=1.0, start=False)
        futs = []
        for i in range(5):
            futs.append(mb.submit(
                np.full((2, 4), float(i), np.float32),
                np.zeros((2, 4), np.float32), np.zeros((2, 4), np.float32),
            ))
        rows = mb._drain_once()
        assert rows == 10
        assert eng.calls == [10]  # ONE dispatch for all 5 requests
        for i, fut in enumerate(futs):
            out = fut.result(timeout=1)
            assert out["mu"].shape == (2, 3)
            np.testing.assert_allclose(out["mu"], float(i))

    def test_max_batch_respected(self):
        from tpu_deer.server import MicroBatcher

        eng = _FakeEngine()
        mb = MicroBatcher(eng, max_batch=4, max_wait_ms=1.0, start=False)
        futs = [
            mb.submit(np.full((2, 4), float(i), np.float32),
                      np.zeros((2, 4), np.float32),
                      np.zeros((2, 4), np.float32))
            for i in range(4)
        ]
        assert mb._drain_once() == 4  # stops at max_batch
        assert mb._drain_once() == 4
        mb.flush()  # dispatch waves run on the pipeline pool
        assert sorted(eng.calls) == [4, 4]
        assert all(f.result(timeout=1)["mu"].shape == (2, 3) for f in futs)

    def test_pipeline_keeps_two_waves_in_flight(self):
        """VERDICT r3 task 7: wave k+1 must dispatch while wave k's device
        round trip is still draining (pipeline_depth=2)."""
        import threading
        import time

        from tpu_deer.server import MicroBatcher

        ev = threading.Event()
        started = []

        class Slow:
            def predict(self, a, v, t):
                started.append(len(a))
                ev.wait(timeout=5)
                return {"mu": np.zeros((len(a), 3), np.float32)}

        mb = MicroBatcher(Slow(), max_batch=4, max_wait_ms=0.0, start=False,
                          pipeline_depth=2)
        row = lambda: (np.zeros((1, 4), np.float32),) * 3
        f1 = mb.submit(*row())
        assert mb._drain_once() == 1  # wave 1 in flight (blocked on ev)
        f2 = mb.submit(*row())
        t0 = time.monotonic()
        assert mb._drain_once() == 1  # wave 2 must NOT wait for wave 1
        assert time.monotonic() - t0 < 2.0
        deadline = time.monotonic() + 2.0
        while len(started) < 2 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert len(started) == 2, "second wave never started while first ran"
        ev.set()
        assert f1.result(timeout=2)["mu"].shape == (1, 3)
        assert f2.result(timeout=2)["mu"].shape == (1, 3)
        mb.flush()

    def test_adaptive_wait_shrinks_under_load(self):
        """When the rows/dispatch EWMA reaches adaptive_rows, the straggler
        window must collapse to zero (the wave cadence batches arrivals);
        light load keeps the full window."""
        import time

        from tpu_deer.server import MicroBatcher

        eng = _FakeEngine()
        mb = MicroBatcher(eng, max_batch=64, max_wait_ms=250.0, start=False,
                          adaptive_rows=8.0)
        row = lambda: (np.zeros((1, 4), np.float32),) * 3
        # Light load: EWMA 0 → the full 250 ms window is honored.
        f = mb.submit(*row())
        t0 = time.monotonic()
        mb._drain_once()
        assert time.monotonic() - t0 >= 0.2
        f.result(timeout=1)
        # Heavy load: EWMA above threshold → no straggler wait.
        mb._rows_ewma = 20.0
        f = mb.submit(*row())
        t0 = time.monotonic()
        mb._drain_once()
        assert time.monotonic() - t0 < 0.15
        f.result(timeout=1)
        mb.flush()

    def test_engine_failure_propagates_to_all(self):
        from tpu_deer.server import MicroBatcher

        class Boom:
            def predict(self, a, v, t):
                raise RuntimeError("device OOM")

        mb = MicroBatcher(Boom(), max_batch=8, max_wait_ms=1.0, start=False)
        futs = [mb.submit(np.zeros((1, 4), np.float32),
                          np.zeros((1, 4), np.float32),
                          np.zeros((1, 4), np.float32)) for _ in range(3)]
        mb._drain_once()
        for f in futs:
            with pytest.raises(RuntimeError, match="device OOM"):
                f.result(timeout=1)

    def test_live_dispatcher_thread_end_to_end(self):
        from tpu_deer.server import MicroBatcher

        eng = _FakeEngine()
        mb = MicroBatcher(eng, max_batch=32, max_wait_ms=20.0)
        futs = [
            mb.submit(np.full((1, 4), float(i), np.float32),
                      np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32))
            for i in range(6)
        ]
        outs = [f.result(timeout=5) for f in futs]
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o["mu"], float(i))
        assert sum(eng.calls) == 6
        assert len(eng.calls) <= 6  # at least no worse than sequential
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32))


class TestMicroBatchService:
    def test_service_with_micro_batching(self, tmp_path_factory):
        model, params = create_complete_deer_model(SMALL, seed=0)
        art = str(tmp_path_factory.mktemp("srv_mb"))
        export_inference(model, params, art, batch_buckets=(1, 4))
        service = PredictionService.from_exported(
            art, micro_batch=True, max_wait_ms=5.0
        )
        plain = PredictionService.from_exported(art)
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 16)).tolist()
        payload = {"audio": feats, "video": feats, "text": feats}

        results = [None] * 4
        def worker(i):
            results[i] = service.predict_json(payload)
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads: t.start()
        for t in threads: t.join(timeout=60)

        ref = plain.predict_json(payload)
        for r in results:
            np.testing.assert_allclose(r["mu"], ref["mu"], atol=1e-5)
        assert service.requests_served == 4
        assert service.batcher.rows_dispatched == 8
        service.batcher.close()


class TestStreamingSessions:
    @pytest.fixture(scope="class")
    def stream_server(self):
        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.serve import InferenceEngine
        from tpu_deer.server import StreamingSessionService
        from tpu_deer.stream import StreamingConfig

        import dataclasses

        cfg = dataclasses.replace(SMALL, audio_dim=84)
        model, params = create_complete_deer_model(cfg, seed=0)
        sc = StreamingConfig(
            frontend=AudioFrontendConfig(n_fft=512, hop_length=128),
            chunk_samples=2048,
        )
        streaming = StreamingSessionService(
            model, params, n_streams=2, stream_cfg=sc, max_wait_ms=5.0
        )
        engine = InferenceEngine(model, params, batch_buckets=(1,))
        service = PredictionService(
            engine, (84, cfg.video_dim, cfg.text_dim), streaming=streaming
        )
        server = serve(service, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{server.server_address[1]}", service, sc
        server.shutdown()
        streaming.close()

    def test_streaming_push_returns_ood(self, rng):
        """A session service built with an input_norm detector returns
        ood_score + is_ood on every push, matching the host detector."""
        import dataclasses

        from tpu_deer.eval.ood import MahalanobisOOD
        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.server import StreamingSessionService
        from tpu_deer.stream import StreamingConfig

        cfg = dataclasses.replace(SMALL, audio_dim=84)
        model, params = create_complete_deer_model(cfg, seed=0)
        sc = StreamingConfig(
            frontend=AudioFrontendConfig(n_fft=512, hop_length=128),
            chunk_samples=2048,
        )
        zeros = np.zeros((128, cfg.video_dim), np.float32)
        det = MahalanobisOOD().fit_modalities(
            rng.normal(size=(128, 84)).astype(np.float32), zeros,
            np.zeros((128, cfg.text_dim), np.float32),
        )
        svc = StreamingSessionService(
            model, params, n_streams=2, stream_cfg=sc, ood_detector=det,
            ood_fpr=0.1,
        )
        try:
            sid = svc.start()
            out = svc.push(
                sid, rng.normal(size=sc.chunk_samples).astype(np.float32)
            )
            assert isinstance(out["is_ood"], bool)
            assert out["is_ood"] == (
                out["ood_score"] > det.threshold(0.1)
            )
        finally:
            svc.close()

    def test_session_lifecycle_over_http(self, stream_server, rng):
        import base64

        url, service, sc = stream_server
        sid = _post_path(url, "/stream/start", {"video": [0.0] * 16})["session_id"]
        chunk = rng.normal(size=sc.chunk_samples).astype(np.float32)

        # float-list push
        out = _post_path(url, "/stream/push",
                         {"session_id": sid, "audio": chunk.tolist()})
        assert np.asarray(out["mu"]).shape == (3,)
        assert np.all(np.isfinite(out["mu"]))
        # Tick responses mirror /predict's channel contract.
        assert out["serving_channel"] in ("calibrated", "eabs")
        alias = (
            "calibrated_uncertainty"
            if out["serving_channel"] == "calibrated"
            else "expected_abs_error"
        )
        assert out["deployable_uncertainty"] == out[alias]

        # pcm16 push
        pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
        out2 = _post_path(url, "/stream/push", {
            "session_id": sid,
            "pcm16_b64": base64.b64encode(pcm).decode(),
        })
        assert np.asarray(out2["mu"]).shape == (3,)

        health = json.loads(
            urllib.request.urlopen(url + "/healthz", timeout=30).read()
        )
        assert health["stream_sessions"] == 1
        assert health["stream_ticks"] >= 2

        assert _post_path(url, "/stream/end", {"session_id": sid})["ended"]
        health = json.loads(
            urllib.request.urlopen(url + "/healthz", timeout=30).read()
        )
        assert health["stream_sessions"] == 0

    def test_stream_push_carries_conformal_intervals(self, stream_server, rng):
        url, service, sc = stream_server
        service.conformal = {
            "alpha": 0.1, "normalized": True,
            "quantiles": np.array([1.0, 2.0, 3.0]),
        }
        try:
            sid = _post_path(url, "/stream/start", {})["session_id"]
            chunk = rng.normal(size=sc.chunk_samples).astype(np.float32)
            out = _post_path(url, "/stream/push",
                             {"session_id": sid, "audio": chunk.tolist()})
            lo, hi = np.asarray(out["interval_lower"]), np.asarray(out["interval_upper"])
            sig = np.sqrt(np.asarray(out["uncertainty"]))
            assert lo.shape == (3,)
            np.testing.assert_allclose(
                hi - lo, 2.0 * sig * np.array([1.0, 2.0, 3.0]), rtol=1e-5)
            _post_path(url, "/stream/end", {"session_id": sid})
        finally:
            service.conformal = None

    def test_slot_exhaustion_and_unknown_session(self, stream_server):
        url, service, sc = stream_server
        sids = [_post_path(url, "/stream/start", {})["session_id"] for _ in range(2)]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(url, "/stream/start", {})
        assert "no free stream slots" in json.loads(e.value.read())["error"]
        for sid in sids:
            _post_path(url, "/stream/end", {"session_id": sid})
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(url, "/stream/push",
                       {"session_id": "nope", "audio": [0.0] * sc.chunk_samples})
        assert e.value.code == 400

    def test_concurrent_sessions_coalesce_and_stay_isolated(
        self, stream_server, rng
    ):
        url, service, sc = stream_server
        sid_a = _post_path(url, "/stream/start", {})["session_id"]
        sid_b = _post_path(url, "/stream/start", {})["session_id"]
        chunk = rng.normal(size=sc.chunk_samples).astype(np.float32).tolist()

        outs = {}
        def push(sid, key):
            outs[key] = _post_path(
                url, "/stream/push", {"session_id": sid, "audio": chunk}
            )
        threads = [
            threading.Thread(target=push, args=(sid_a, "a")),
            threading.Thread(target=push, args=(sid_b, "b")),
        ]
        for t in threads: t.start()
        for t in threads: t.join(timeout=120)
        # Same audio, same (fresh) state → identical predictions.
        np.testing.assert_allclose(outs["a"]["mu"], outs["b"]["mu"], atol=1e-5)
        for sid in (sid_a, sid_b):
            _post_path(url, "/stream/end", {"session_id": sid})


class TestReviewFixes:
    """Regression tests for the dispatcher-ordering/race review findings."""

    def test_micro_batcher_never_exceeds_max_batch(self):
        from tpu_deer.server import MicroBatcher

        eng = _FakeEngine()
        mb = MicroBatcher(eng, max_batch=4, max_wait_ms=1.0, start=False)
        futs = [
            mb.submit(np.full((3, 4), float(i), np.float32),
                      np.zeros((3, 4), np.float32),
                      np.zeros((3, 4), np.float32))
            for i in range(2)
        ]
        assert mb._drain_once() == 3  # 3+3 > 4: second request deferred
        assert mb._drain_once() == 3
        mb.flush()  # dispatch waves run on the pipeline pool
        assert sorted(eng.calls) == [3, 3]
        # Order preserved across the deferral.
        np.testing.assert_allclose(futs[0].result(timeout=1)["mu"], 0.0)
        np.testing.assert_allclose(futs[1].result(timeout=1)["mu"], 1.0)

    def test_micro_batcher_close_fails_queued_requests(self):
        from tpu_deer.server import MicroBatcher

        mb = MicroBatcher(_FakeEngine(), start=False)
        fut = mb.submit(np.zeros((1, 4), np.float32),
                        np.zeros((1, 4), np.float32),
                        np.zeros((1, 4), np.float32))
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=1)

    @pytest.fixture()
    def manual_service(self):
        import dataclasses

        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.server import StreamingSessionService
        from tpu_deer.stream import StreamingConfig

        cfg = dataclasses.replace(SMALL, audio_dim=84)
        model, params = create_complete_deer_model(cfg, seed=0)
        sc = StreamingConfig(
            frontend=AudioFrontendConfig(n_fft=512, hop_length=128),
            chunk_samples=2048,
        )
        return StreamingSessionService(
            model, params, n_streams=2, stream_cfg=sc, max_wait_ms=1.0,
            start=False,
        )

    def test_same_session_pushes_keep_order_across_deferral(
        self, manual_service, rng
    ):
        from concurrent.futures import Future

        svc = manual_service
        sid = svc.start()
        other = svc.start()
        c = [rng.normal(size=svc.chunk_samples).astype(np.float32)
             for _ in range(3)]
        f1 = svc._enqueue(("push", sid, c[0], Future()))
        f2 = svc._enqueue(("push", sid, c[1], Future()))   # same sid: defers
        f3 = svc._enqueue(("push", other, c[2], Future()))
        fe = svc._enqueue(("end", sid, None, Future()))

        assert svc._tick() == 1      # c[0] alone (c[1] deferred to carry)
        assert f1.result(timeout=1)
        assert not f2.done()
        assert svc._tick() >= 1      # carried c[1] first — order preserved
        assert f2.done() and not fe.done()
        while not fe.done():
            svc._tick()              # drain other push + the end
        assert f3.result(timeout=1)
        assert fe.result(timeout=1) is True
        assert len(svc.sessions) == 1  # sid gone, other remains

        # Replaying the same audio on a fresh slot gives the same features
        # as the slot's first occupant saw — proof the end reset the state
        # before the slot was reusable.
        sid2 = svc.start()
        g1 = svc._enqueue(("push", sid2, c[0], Future()))
        svc._tick()
        r_new = g1.result(timeout=1)
        from tpu_deer.server import StreamingSessionService

        fresh = StreamingSessionService(
            svc.rec.model, svc.rec.params, n_streams=2, stream_cfg=svc.cfg,
            max_wait_ms=1.0, start=False,
        )
        sidf = fresh.start()
        gf = fresh._enqueue(("push", sidf, c[0], Future()))
        fresh._tick()
        np.testing.assert_allclose(
            r_new["mu"], gf.result(timeout=1)["mu"], atol=1e-5
        )

    def test_push_for_session_ended_while_queued_fails_cleanly(
        self, manual_service, rng
    ):
        from concurrent.futures import Future

        svc = manual_service
        sid = svc.start()
        chunk = rng.normal(size=svc.chunk_samples).astype(np.float32)
        fe = svc._enqueue(("end", sid, None, Future()))
        fp = svc._enqueue(("push", sid, chunk, Future()))
        svc._tick()  # end processed first (queue order)
        assert fe.result(timeout=1) is True
        svc._tick()  # push now targets a dead session
        with pytest.raises(ValueError, match="unknown session"):
            fp.result(timeout=1)

    def test_reset_streams_empty_is_noop(self, rng):
        import dataclasses

        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.stream import StreamingConfig, StreamingRecognizer

        cfg = dataclasses.replace(SMALL, audio_dim=84)
        model, params = create_complete_deer_model(cfg, seed=0)
        sc = StreamingConfig(
            frontend=AudioFrontendConfig(n_fft=512, hop_length=128),
            chunk_samples=2048,
        )
        rec = StreamingRecognizer(model, params, n_streams=2, cfg=sc)
        rec.reset_streams([])  # must not raise

    def test_streaming_config_rejects_too_few_frames_per_chunk(self):
        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.stream import StreamingConfig

        with pytest.raises(ValueError, match="frames/chunk"):
            StreamingConfig(
                frontend=AudioFrontendConfig(n_fft=1024, hop_length=256),
                chunk_samples=1024,  # only 4 frames < delta_width-1 = 8
            )


class TestContextRefresh:
    def test_push_with_video_context_changes_prediction(self, rng):
        import dataclasses

        from tpu_deer.ops.audio_frontend import AudioFrontendConfig
        from tpu_deer.server import StreamingSessionService
        from tpu_deer.stream import StreamingConfig

        cfg = dataclasses.replace(SMALL, audio_dim=84)
        model, params = create_complete_deer_model(cfg, seed=0)
        sc = StreamingConfig(
            frontend=AudioFrontendConfig(n_fft=512, hop_length=128),
            chunk_samples=2048,
        )
        svc = StreamingSessionService(
            model, params, n_streams=2, stream_cfg=sc, max_wait_ms=1.0,
        )
        try:
            sid = svc.start()
            chunk = rng.normal(size=sc.chunk_samples).astype(np.float32)
            base = svc.push(sid, chunk)
            # Refreshing the video context mid-session changes the fusion
            # input, so the next prediction must move.
            ctx = svc.push(
                sid, chunk,
                video=np.full(cfg.video_dim, 2.0, np.float32),
            )
            assert np.abs(
                np.asarray(ctx["mu"]) - np.asarray(base["mu"])
            ).max() > 1e-4
            with pytest.raises(ValueError, match="unknown session"):
                svc.set_context("nope", video=np.zeros(cfg.video_dim))
        finally:
            svc.close()


class TestCloseWhileBusy:
    def test_close_does_not_race_live_dispatcher(self):
        """close() must not touch dispatcher-private state while the thread
        is mid-dispatch; late requests fail cleanly either way."""
        import time as _time

        from tpu_deer.server import MicroBatcher

        release = threading.Event()
        entered = threading.Event()

        class SlowEngine:
            def predict(self, a, v, t):
                entered.set()
                release.wait(timeout=30)
                return {"mu": np.zeros((len(a), 3), np.float32)}

        mb = MicroBatcher(SlowEngine(), max_wait_ms=1.0)
        fut = mb.submit(np.zeros((1, 4), np.float32),
                        np.zeros((1, 4), np.float32),
                        np.zeros((1, 4), np.float32))
        assert entered.wait(timeout=10)  # dispatcher is now inside predict

        closer = threading.Thread(target=mb.close)
        closer.start()
        _time.sleep(0.2)  # close() is waiting on the join
        release.set()  # let the dispatch finish
        closer.join(timeout=35)
        assert not closer.is_alive()
        # The in-flight request completed normally despite the close.
        assert fut.result(timeout=5)["mu"].shape == (1, 3)
        with pytest.raises(RuntimeError, match="closed"):
            mb.submit(np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32))


class TestEnsembleServer:
    def test_serve_ensemble_checkpoint(self, tmp_path):
        """--ensemble K path: the service comes up on a stacked checkpoint
        and /predict returns the moment-matched combined prediction."""
        from tpu_deer.train.checkpoint import CheckpointManager
        from tpu_deer.train.ensemble import EnsembleTrainer, create_deer_ensemble
        from tpu_deer.train.trainer import TrainingConfig

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(
            model, stacked,
            TrainingConfig(batch_size=32, num_epochs=1, warmup_epochs=0),
            steps_per_epoch=2,
        )
        ckpt = CheckpointManager(str(tmp_path))
        ckpt.save(tr.state, step=1)

        service = PredictionService.from_checkpoint(
            str(tmp_path), config=SMALL, step=1, ensemble_members=2,
            batch_buckets=(1, 4),
        )
        server = serve(service, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{server.server_address[1]}"
            rng = np.random.default_rng(0)
            feats = rng.standard_normal((2, 16)).tolist()
            out = _post(url, {"audio": feats, "video": feats, "text": feats})
            assert np.asarray(out["mu"]).shape == (2, 3)
            assert np.all(np.asarray(out["uncertainty"]) > 0)
        finally:
            server.shutdown()

    def test_streaming_rejects_ensemble(self, tmp_path):
        from tpu_deer.train.checkpoint import CheckpointManager
        from tpu_deer.train.ensemble import EnsembleTrainer, create_deer_ensemble
        from tpu_deer.train.trainer import TrainingConfig

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(
            model, stacked,
            TrainingConfig(batch_size=32, num_epochs=1, warmup_epochs=0),
            steps_per_epoch=2,
        )
        CheckpointManager(str(tmp_path)).save(tr.state, step=1)
        with pytest.raises(ValueError, match="single parameter tree"):
            PredictionService.from_checkpoint(
                str(tmp_path), config=SMALL, step=1, ensemble_members=2,
                stream_slots=2,
            )
