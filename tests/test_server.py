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


def _post(url, payload):
    req = urllib.request.Request(
        url + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


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

    def test_single_sample_1d(self, running_server):
        url, _ = running_server
        row = [0.0] * 16
        out = _post(url, {"audio": row, "video": row, "text": row})
        assert np.asarray(out["mu"]).shape == (1, 3)

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

    def test_unknown_path_404(self, running_server):
        url, _ = running_server
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(url + "/nope", timeout=30)
        assert e.value.code == 404
