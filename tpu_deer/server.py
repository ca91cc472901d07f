"""Minimal HTTP serving endpoint over the inference engines.

The reference has no serving story (inference = "import torch and call the
module"). This exposes the bucketed engines (live-jit serve.InferenceEngine
or an AOT tpu_deer.export artifact) over HTTP with nothing beyond the
standard library:

  POST /predict   {"audio": [[..84..]], "video": [[..256..]], "text": [[..768..]]}
                  -> {"mu": [[v,a,d]..], "uncertainty": ..,
                      "calibrated_uncertainty": ..}
  GET  /healthz   -> {"status": "ok", "requests_served": N}

Run:
  python -m tpu_deer.server --checkpoint <ckpt_dir> --port 8571
  python -m tpu_deer.server --exported <export_dir> --port 8571

The handler serializes requests through a lock: the engine pads each request
to a compiled batch bucket, so a single in-flight batch is the intended
concurrency model (scale out with one process per chip). ThreadingHTTPServer
keeps slow clients from blocking accepts; numpy arrays never leave the
process un-validated (shape/dtype checked against the model config).
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

MAX_BODY_BYTES = 64 * 1024 * 1024  # 64 MB request cap


class PredictionService:
    """Engine wrapper with input validation and request accounting."""

    def __init__(self, engine, dims: tuple[int, int, int]):
        self.engine = engine
        self.dims = dims
        self.lock = threading.Lock()
        self.requests_served = 0

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, config=None, **kwargs):
        from tpu_deer.models.deer_model import DEERModelConfig
        from tpu_deer.serve import InferenceEngine

        config = config or DEERModelConfig()
        engine = InferenceEngine.from_checkpoint(
            checkpoint_dir, config=config, **kwargs
        )
        return cls(engine, (config.audio_dim, config.video_dim, config.text_dim))

    @classmethod
    def from_exported(cls, export_dir: str):
        from tpu_deer.export import load_exported

        engine = load_exported(export_dir)
        c = engine.manifest["config"]
        return cls(engine, (c["audio_dim"], c["video_dim"], c["text_dim"]))

    def predict_json(self, payload: dict) -> dict:
        arrays = []
        for name, dim in zip(("audio", "video", "text"), self.dims):
            if name not in payload:
                raise ValueError(f"missing field {name!r}")
            arr = np.asarray(payload[name], dtype=np.float32)
            if arr.ndim == 1:
                arr = arr[None, :]
            if arr.ndim != 2 or arr.shape[1] != dim:
                raise ValueError(
                    f"{name} must be [N, {dim}], got {list(arr.shape)}"
                )
            if not np.all(np.isfinite(arr)):
                raise ValueError(f"{name} contains non-finite values")
            arrays.append(arr)
        n = {len(a) for a in arrays}
        if len(n) != 1:
            raise ValueError(f"modalities disagree on batch size: {sorted(n)}")
        with self.lock:
            out = self.engine.predict(*arrays)
            self.requests_served += 1
        return {
            k: np.asarray(v).tolist()
            for k, v in out.items()
            if k in ("mu", "uncertainty", "calibrated_uncertainty")
        }


def make_handler(service: PredictionService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "requests_served": service.requests_served,
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > MAX_BODY_BYTES:
                self._reply(413, {"error": "missing or oversized body"})
                return
            try:
                payload = json.loads(self.rfile.read(length))
                result = service.predict_json(payload)
            except ValueError as e:
                self._reply(400, {"error": str(e)})
                return
            except json.JSONDecodeError as e:
                self._reply(400, {"error": f"invalid JSON: {e}"})
                return
            self._reply(200, result)

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

    return Handler


def serve(service: PredictionService, host: str = "127.0.0.1", port: int = 8571):
    server = ThreadingHTTPServer((host, port), make_handler(service))
    logger.info("serving on http://%s:%d (POST /predict, GET /healthz)",
                host, port)
    return server


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="CheckpointManager directory")
    src.add_argument("--exported", help="tpu_deer.export artifact directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the batch buckets at startup")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.checkpoint:
        service = PredictionService.from_checkpoint(args.checkpoint)
        if not args.no_warmup:
            service.engine.warmup()
    else:
        service = PredictionService.from_exported(args.exported)

    server = serve(service, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
