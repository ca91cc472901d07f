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

By default the handler serializes requests through a lock: the engine pads
each request to a compiled batch bucket, so a single in-flight batch is the
intended concurrency model (scale out with one process per chip).
ThreadingHTTPServer keeps slow clients from blocking accepts; numpy arrays
never leave the process un-validated (shape/dtype checked against the model
config).

With `--micro_batch`, concurrent requests are COALESCED: request threads
enqueue and a single dispatcher thread drains the queue into one device
dispatch (up to `max_batch` rows, waiting at most `max_wait_ms` for
stragglers). Under load this turns N tiny padded batches into one large
batch — the TPU sees MXU-sized matmuls and per-request latency *drops*
because requests no longer queue behind N-1 sequential dispatches.
"""

from __future__ import annotations

import argparse
import json
import logging
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

MAX_BODY_BYTES = 64 * 1024 * 1024  # 64 MB request cap


class MicroBatcher:
    """Coalesces concurrent predict requests into single engine dispatches.

    Request threads call `submit(audio, video, text)` and block on the
    returned Future. One dispatcher thread drains the queue: it takes the
    first waiting request, then keeps collecting until `max_batch` rows are
    assembled or `max_wait_ms` elapses, concatenates, runs ONE
    `engine.predict`, and scatters the row slices back to each Future.
    Per-request work is O(copy); device time is paid once per coalesced
    batch instead of once per request.
    """

    def __init__(self, engine, max_batch: int = 256, max_wait_ms: float = 2.0,
                 start: bool = True):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.queue: "queue.Queue" = queue.Queue()
        self.batches_dispatched = 0
        self.rows_dispatched = 0
        self._closed = False
        self._thread = None
        if start:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def submit(self, audio, video, text) -> Future:
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        fut: Future = Future()
        self.queue.put((audio, video, text, fut))
        return fut

    def close(self):
        self._closed = True
        self.queue.put(None)  # wake the dispatcher
        if self._thread is not None:
            self._thread.join(timeout=5.0)

    # -- dispatcher ------------------------------------------------------
    def _loop(self):
        while True:
            item = self.queue.get()
            if item is None:
                return
            self._drain_once(first=item)

    def _drain_once(self, first=None):
        """Collect one coalesced batch (starting from `first`, or blocking
        for the next request) and dispatch it. Returns rows dispatched."""
        import time

        if first is None:
            first = self.queue.get()
            if first is None:
                return 0
        batch = [first]
        rows = len(first[0])
        deadline = time.monotonic() + self.max_wait_s
        while rows < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                item = (
                    self.queue.get_nowait()
                    if remaining <= 0
                    else self.queue.get(timeout=remaining)
                )
            except queue.Empty:
                break
            if item is None:  # close() sentinel: dispatch what we have
                self.queue.put(None)
                break
            batch.append(item)
            rows += len(item[0])
        try:
            a = np.concatenate([b[0] for b in batch])
            v = np.concatenate([b[1] for b in batch])
            t = np.concatenate([b[2] for b in batch])
            out = self.engine.predict(a, v, t)
            self.batches_dispatched += 1
            self.rows_dispatched += rows
            off = 0
            for ba, _, _, fut in batch:
                n = len(ba)
                fut.set_result({k: val[off : off + n] for k, val in out.items()})
                off += n
        except Exception as e:  # noqa: BLE001 — fail every waiting request
            for *_, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
        return rows


class PredictionService:
    """Engine wrapper with input validation and request accounting."""

    def __init__(self, engine, dims: tuple[int, int, int],
                 micro_batch: bool = False, max_batch: int = 256,
                 max_wait_ms: float = 2.0):
        self.engine = engine
        self.dims = dims
        self.lock = threading.Lock()
        self.requests_served = 0
        self.batcher = (
            MicroBatcher(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)
            if micro_batch
            else None
        )

    _SERVICE_KW = ("micro_batch", "max_batch", "max_wait_ms")

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, config=None, **kwargs):
        from tpu_deer.models.deer_model import DEERModelConfig
        from tpu_deer.serve import InferenceEngine

        svc_kw = {k: kwargs.pop(k) for k in cls._SERVICE_KW if k in kwargs}
        config = config or DEERModelConfig()
        engine = InferenceEngine.from_checkpoint(
            checkpoint_dir, config=config, **kwargs
        )
        return cls(
            engine,
            (config.audio_dim, config.video_dim, config.text_dim),
            **svc_kw,
        )

    @classmethod
    def from_exported(cls, export_dir: str, **kwargs):
        from tpu_deer.export import load_exported

        engine = load_exported(export_dir)
        c = engine.manifest["config"]
        return cls(
            engine, (c["audio_dim"], c["video_dim"], c["text_dim"]), **kwargs
        )

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
        if self.batcher is not None:
            out = self.batcher.submit(*arrays).result(timeout=120.0)
            with self.lock:
                self.requests_served += 1
        else:
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
                stats = {
                    "status": "ok",
                    "requests_served": service.requests_served,
                }
                if service.batcher is not None:
                    stats["micro_batches_dispatched"] = (
                        service.batcher.batches_dispatched
                    )
                    stats["micro_batch_rows"] = service.batcher.rows_dispatched
                self._reply(200, stats)
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
    p.add_argument("--micro_batch", action="store_true",
                   help="coalesce concurrent requests into one dispatch")
    p.add_argument("--max_batch", type=int, default=256,
                   help="micro-batching: max coalesced rows per dispatch")
    p.add_argument("--max_wait_ms", type=float, default=2.0,
                   help="micro-batching: max straggler wait per dispatch")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    mb = dict(micro_batch=args.micro_batch, max_batch=args.max_batch,
              max_wait_ms=args.max_wait_ms)
    if args.checkpoint:
        service = PredictionService.from_checkpoint(args.checkpoint, **mb)
        if not args.no_warmup:
            service.engine.warmup()
    else:
        service = PredictionService.from_exported(args.exported, **mb)

    server = serve(service, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
