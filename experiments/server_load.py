"""Server load study: concurrent-client latency/throughput over HTTP.

The HTTP layer (tpu_deer/server.py) has unit tests but VERDICT r2 asked for
a measured artifact a deployer can capacity-plan from (ask #8): p50/p99
request latency and sustained throughput under N concurrent clients, with
micro-batching off vs on.

Method: an in-process ThreadingHTTPServer over a live-jit InferenceEngine
(the `python -m tpu_deer.server --checkpoint …` configuration), hammered by
N client threads each issuing sequential single-row POST /predict requests
over real sockets (urllib). Every latency sample includes JSON encode,
socket round trip, request validation, dispatch (device compute + host
fetch — engine.predict materializes numpy, so device time is really paid;
see bench.py on why a host fetch is mandatory for honest timing here), and
response decode. Per cell we report client-observed p50/p95/p99 and
aggregate request throughput.

Expected shape of the result (docs/SERVING.md): without micro-batching the
handler serializes dispatches, so p50 grows ~linearly with N; with
--micro_batch concurrent requests coalesce into one device dispatch
(MicroBatcher), so throughput scales and p99 stays bounded by one coalesced
dispatch + the max_wait_ms straggler window.

Run (TPU, ~10 min incl. bucket compiles): python experiments/server_load.py
Quick CPU smoke:                          python experiments/server_load.py --quick

Writes experiments/RESULTS_serving.md (+ .json sidecar).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _post(url: str, payload: dict, timeout: float = 300.0) -> dict:
    req = urllib.request.Request(
        url + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _make_service(micro_batch: bool, quick: bool, max_wait_ms: float,
                  pipeline_depth: int = 2):
    from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
    from tpu_deer.serve import InferenceEngine
    from tpu_deer.server import PredictionService

    cfg = (
        DEERModelConfig(
            audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32,
            fusion_dim=64, attention_heads=4, encoder_layers=1,
        )
        if quick
        else DEERModelConfig()  # the flagship 3.9M-param serving config
    )
    model, params = create_complete_deer_model(cfg, seed=0)
    engine = InferenceEngine(model, params)
    engine.warmup()  # compile every batch bucket before timing
    return (
        PredictionService(
            engine, (cfg.audio_dim, cfg.video_dim, cfg.text_dim),
            micro_batch=micro_batch, max_batch=256, max_wait_ms=max_wait_ms,
            pipeline_depth=pipeline_depth,
        ),
        cfg,
    )


def _run_cell(url: str, dims, n_clients: int, reqs_per_client: int) -> dict:
    """N client threads × M sequential single-row requests; returns
    client-observed latency quantiles + aggregate throughput."""
    rng = np.random.default_rng(0)
    row = {
        name: rng.standard_normal(d).astype(np.float32).tolist()
        for name, d in zip(("audio", "video", "text"), dims)
    }
    latencies = [[] for _ in range(n_clients)]
    barrier = threading.Barrier(n_clients + 1)
    errors: list = []

    def client(i: int):
        try:
            barrier.wait()
            for _ in range(reqs_per_client):
                t0 = time.perf_counter()
                out = _post(url, row)
                latencies[i].append(time.perf_counter() - t0)
                assert len(out["mu"]) == 1
        except Exception as e:  # noqa: BLE001 — surfaced to the main thread
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    lat = np.concatenate([np.asarray(l) for l in latencies]) * 1e3  # ms
    return {
        "n_clients": n_clients,
        "requests": int(lat.size),
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
        "mean_ms": float(lat.mean()),
        "throughput_rps": float(lat.size / wall),
        "wall_s": float(wall),
    }


def run(quick: bool, max_wait_ms: float, pipeline_depth: int = 2) -> dict:
    from tpu_deer.server import serve

    import jax

    platform = jax.devices()[0].platform
    client_grid = (1, 4, 16) if quick else (1, 4, 16, 64)
    reqs = 10 if quick else 40

    results: dict[str, list] = {}
    mb_stats: dict[str, dict] = {}
    for mode, micro in (("serialized", False), ("micro_batch", True)):
        service, cfg = _make_service(micro, quick, max_wait_ms,
                                     pipeline_depth)
        dims = (cfg.audio_dim, cfg.video_dim, cfg.text_dim)
        server = serve(service, host="127.0.0.1", port=0)
        url = f"http://127.0.0.1:{server.server_address[1]}"
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            _post(url, {  # one connection warm-up, excluded from timing
                n: [0.0] * d for n, d in zip(("audio", "video", "text"), dims)
            })
            rows = []
            for n in client_grid:
                # Per-cell coalescing deltas (ADVICE r3: an aggregate over
                # warm-up + every cell understates coalescing at high load —
                # the 1-client cell coalesces at ~1 row/dispatch).
                b = service.batcher
                b0 = (b.batches_dispatched, b.rows_dispatched) if b else (0, 0)
                cell = _run_cell(url, dims, n, reqs)
                if b is not None:
                    d_batches = b.batches_dispatched - b0[0]
                    d_rows = b.rows_dispatched - b0[1]
                    cell["dispatches"] = d_batches
                    cell["rows_per_dispatch"] = d_rows / max(d_batches, 1)
                print(
                    f"[{mode}] clients={n:3d} p50 {cell['p50_ms']:8.1f} ms  "
                    f"p99 {cell['p99_ms']:8.1f} ms  "
                    f"{cell['throughput_rps']:7.1f} req/s"
                    + (
                        f"  {cell['rows_per_dispatch']:.1f} rows/dispatch"
                        if "rows_per_dispatch" in cell
                        else ""
                    )
                )
                rows.append(cell)
            results[mode] = rows
            if service.batcher is not None:
                b = service.batcher
                mb_stats[mode] = {
                    "batches_dispatched": b.batches_dispatched,
                    "rows_dispatched": b.rows_dispatched,
                }
                b.close()
        finally:
            server.shutdown()
    return {
        "platform": platform,
        "quick": quick,
        "max_wait_ms": max_wait_ms,
        "pipeline_depth": pipeline_depth,
        "reqs_per_client": reqs,
        "results": results,
        "micro_batch_stats": mb_stats,
    }


def write_report(payload: dict, path_md: str, path_json: str) -> None:
    with open(path_json, "w") as f:
        json.dump(payload, f, indent=2)
    res = payload["results"]
    lines = [
        "# Serving load study — concurrent clients over HTTP",
        "",
        f"Platform: **{payload['platform']}** | single-row POST /predict | "
        f"{payload['reqs_per_client']} requests/client | micro-batch "
        f"max_wait {payload['max_wait_ms']} ms, max_batch 256, "
        f"pipeline_depth {payload.get('pipeline_depth', 2)} | "
        "in-process ThreadingHTTPServer + live-jit InferenceEngine "
        "(the `python -m tpu_deer.server --checkpoint …` configuration).",
        "",
        "Latencies are client-observed (JSON + socket + validation + device "
        "dispatch + host fetch). Generated by `experiments/server_load.py`.",
        "",
        "| clients | mode | p50 ms | p95 ms | p99 ms | p99/p50 | req/s | rows/dispatch |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for i, cell in enumerate(res["serialized"]):
        for mode in ("serialized", "micro_batch"):
            c = res[mode][i]
            rpd = (
                f"{c['rows_per_dispatch']:.1f}"
                if "rows_per_dispatch" in c
                else "—"
            )
            lines.append(
                f"| {c['n_clients']} | {mode} | {c['p50_ms']:.1f} | "
                f"{c['p95_ms']:.1f} | {c['p99_ms']:.1f} | "
                f"{c['p99_ms'] / c['p50_ms']:.2f} | "
                f"{c['throughput_rps']:.1f} | {rpd} |"
            )
    lines += [
        "",
        "rows/dispatch is the per-cell coalescing delta (dispatch counters "
        "snapshotted around each cell, so the 1-client cell's ~1 "
        "row/dispatch doesn't dilute the high-load figure).",
    ]
    smax = res["serialized"][-1]
    mmax = res["micro_batch"][-1]
    lines += [
        "",
        "## Reading",
        "",
        f"- At {smax['n_clients']} clients, micro-batching moves p99 from "
        f"{smax['p99_ms']:.0f} ms to {mmax['p99_ms']:.0f} ms and throughput "
        f"from {smax['throughput_rps']:.0f} to {mmax['throughput_rps']:.0f} "
        "req/s: coalesced requests share one device dispatch instead of "
        "queueing behind N-1 sequential ones.",
        "- Deployment rule of thumb: enable `--micro_batch` whenever more "
        "than a handful of concurrent clients are expected; the cost is the "
        f"`max_wait_ms` ({payload['max_wait_ms']} ms) straggler window on an "
        "idle server.",
    ]
    rtt = res["micro_batch"][0]["p50_ms"]  # 1-client p50 ~= tunnel RTT
    lines += [
        f"- Tail floor: through this dev tunnel one dispatch wave costs "
        f"~{rtt:.0f} ms RTT, so a request that just misses a wave pays one "
        f"extra RTT — at {mmax['n_clients']} clients the p99−p50 gap is "
        f"{(mmax['p99_ms'] - mmax['p50_ms']) / rtt:.1f} RTTs "
        f"(p99/p50 {mmax['p99_ms'] / mmax['p50_ms']:.2f}). The ratio is "
        "RTT-bound here, not scheduler-bound: co-located serving (~ms "
        "dispatch) collapses the same wave miss to ~1 ms. Measured depth "
        "sweep (r4): pipeline_depth 2 (default) overlaps wave assembly "
        "with the in-flight round trip; depth 4 measured WORSE at 64 "
        "clients (p99 1106 vs 654-703 ms) because extra waves fragment "
        "coalescing (8.1 vs 15.1 rows/dispatch). The adaptive max_wait "
        "window closes under sustained load, so the straggler wait never "
        "adds to the tail at saturation.",
        "",
    ]
    with open(path_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path_md}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="small model, small grid (CPU smoke)")
    p.add_argument("--max_wait_ms", type=float, default=2.0)
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="micro-batch dispatch waves in flight at once")
    args = p.parse_args(argv)

    payload = run(args.quick, args.max_wait_ms, args.pipeline_depth)
    suffix = "_quick" if args.quick else ""
    write_report(
        payload,
        os.path.join(HERE, f"RESULTS_serving{suffix}.md"),
        os.path.join(HERE, f"RESULTS_serving{suffix}.json"),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
