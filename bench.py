"""Benchmark harness: full-size trimodal DEER inference on one chip.

Prints ONE JSON line:
  {"metric": "p50_per_sample_latency_ms", "value": N, "unit": "ms",
   "vs_baseline": 47/N}

Baseline: the reference claims 47 ms per sample inference latency
(reference README.md:30; BASELINE.md). vs_baseline > 1 means faster than the
reference. The north-star target is < 5 ms p50/sample on one TPU chip.

Measurement honesty (important in this environment): the TPU is behind a
remote tunnel whose `block_until_ready` acknowledges locally WITHOUT waiting
for remote execution (calibrated: a chained 50-matmul loop "finished" at an
impossible 52 PFLOP/s; a single 8192^3 matmul "completed" in 0.02 ms vs
27+ ms for an actual value fetch). Every timing here therefore forces a HOST
FETCH of a result — the only event that provably covers remote execution —
and amortizes the ~25-30 ms tunnel round trip by batching work per dispatch:

  * headline p50/sample: serving batch of 256 through one dispatch+fetch,
    divided by 256 (amortized per-sample serving latency, round trip
    INCLUDED — conservative);
  * batch-1 end-to-end latency is also reported on stderr (it is tunnel-RTT
    dominated, alongside the measured RTT floor for context);
  * forward throughput: K batches via one lax.scan dispatch + one fetch;
  * train throughput: K chained train steps + one final loss fetch.

All numbers are LOWER bounds on what co-located hardware would deliver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MS = 47.0


def _probe_backend(attempts: int | None = None,
                   probe_timeout_s: int = 90) -> bool:
    """Return True once `import jax` completes in a fresh subprocess.

    The tunneled-TPU backend registers at interpreter start and has been
    observed to WEDGE (import jax blocks forever — see CLAUDE.md). Probing
    in a subprocess with a timeout turns an unbounded hang into a bounded,
    retried, diagnosable failure. Retries cover transient wedges (~10 min
    window at the defaults).
    """
    if attempts is None:
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "8"))
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return True  # CPU backend cannot wedge
    for i in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print(
                f"# backend probe {i + 1}/{attempts} failed "
                f"(tunnel wedged or unreachable); retrying",
                file=sys.stderr,
            )
            time.sleep(5)
    return False


def _e2e_times_ms(dispatch, fetch_arg_list, iters=None) -> np.ndarray:
    """Per-iteration: dispatch on fresh args, then FORCE a host fetch."""
    times = []
    for args in fetch_arg_list[: iters or len(fetch_arg_list)]:
        t0 = time.perf_counter()
        out = dispatch(*args)
        np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
        times.append((time.perf_counter() - t0) * 1e3)
    return np.asarray(times)


def _reexec_cpu_for_quick() -> None:
    """--quick is a structural smoke, not a measurement: force the CPU
    backend (ambient env registers the tunneled TPU at interpreter start,
    and a wedged tunnel would hang a smoke that must always run)."""
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main(quick: bool = False) -> int:
    """quick=True: CPU structural smoke — every section below runs with the
    EXACT dispatch structure of the real bench (same jit/vmap/scan nesting,
    plus the pallas frontend in interpret mode) on tiny shapes, so harness
    breakage like BENCH_r03 (vmap x Pallas lowering) is caught by the test
    suite instead of the end-of-round driver run. Timings in quick mode are
    meaningless and the JSON line says so."""
    if quick:
        _reexec_cpu_for_quick()
    if not _probe_backend():
        print(
            "# FATAL: jax backend never came up (the TPU tunnel wedges "
            "`import jax` — see CLAUDE.md). Bench needs the real chip; "
            "retry when the tunnel recovers.",
            file=sys.stderr,
        )
        return 2

    def _mark(section: str) -> None:
        # Progress trail on stderr (flushed): when the tunnel wedges
        # mid-run (observed 2026-08-20, 25 min silent), the redirected log
        # must show WHICH section was in flight.
        print(f"# [{time.strftime('%H:%M:%S')}] {section}", file=sys.stderr,
              flush=True)

    _mark("importing jax / registering backend")
    import jax
    import jax.numpy as jnp

    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        count_parameters,
        create_complete_deer_model,
    )

    platform = jax.devices()[0].platform
    # bf16 on TPU for the dense path; params and NIG math stay f32.
    compute_dtype = "bfloat16" if platform != "cpu" else "float32"
    config = DEERModelConfig(compute_dtype=compute_dtype)
    model, params = create_complete_deer_model(config, seed=0)
    n_params = count_parameters(params)

    @jax.jit
    def forward(params, audio, video, text):
        out = model.apply({"params": params}, audio, video, text,
                          deterministic=True)
        return out["mu_all"], out["calibrated_uncertainty"]

    rng = np.random.default_rng(0)

    def make_batch(b):
        return (
            jnp.asarray(rng.standard_normal((b, config.audio_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, config.video_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, config.text_dim)), jnp.float32),
        )

    _mark("rtt floor")
    # --- tunnel round-trip floor (tiny jitted op + fetch, fresh each time)
    tiny = jnp.arange(8, dtype=jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    _ = np.asarray(bump(tiny, 0.0))  # compile
    rtt = _e2e_times_ms(
        bump, [(tiny, float(i + 1)) for i in range(2 if quick else 15)]
    )
    rtt_ms = float(np.percentile(rtt, 50))

    _mark("batch-1 latency")
    # --- batch-1 end-to-end latency (RTT-dominated through the tunnel) ----
    warm = make_batch(1)
    np.asarray(forward(params, *warm)[0])  # compile
    b1 = _e2e_times_ms(
        forward, [(params, *make_batch(1)) for _ in range(2 if quick else 30)]
    )
    b1_p50 = float(np.percentile(b1, 50))

    _mark("serving p50 (batch 256)")
    # --- headline: amortized per-sample serving latency at batch 256 ------
    SERVE_B = 8 if quick else 256
    np.asarray(forward(params, *make_batch(SERVE_B))[0])  # compile
    sv = _e2e_times_ms(
        forward,
        [(params, *make_batch(SERVE_B)) for _ in range(2 if quick else 20)],
    )
    p50 = float(np.percentile(sv, 50)) / SERVE_B
    p99 = float(np.percentile(sv, 99)) / SERVE_B

    _mark("int8 serving")
    # --- int8-weight serving at the same batch (weight HBM traffic /4) ----
    from tpu_deer.ops.quantization import dequantize_tree_device, quantize_tree

    q_tree, s_tree = jax.tree_util.tree_map(
        jnp.asarray, quantize_tree(jax.device_get(params))
    )

    @jax.jit
    def forward_q(q_tree, s_tree, audio, video, text):
        p = dequantize_tree_device(q_tree, s_tree)
        out = model.apply({"params": p}, audio, video, text,
                          deterministic=True)
        return out["mu_all"], out["calibrated_uncertainty"]

    np.asarray(forward_q(q_tree, s_tree, *make_batch(SERVE_B))[0])  # compile
    svq = _e2e_times_ms(
        forward_q,
        [(q_tree, s_tree, *make_batch(SERVE_B))
         for _ in range(2 if quick else 20)],
    )
    p50_q = float(np.percentile(svq, 50)) / SERVE_B

    _mark("forward throughput scan")
    # --- forward throughput: K batches in ONE scan dispatch + one fetch.
    # Inputs are generated ON DEVICE inside the scan (negligible vs the
    # model FLOPs) so the dispatch carries ~20 TFLOP of work and the ~27 ms
    # tunnel round trip amortizes to <3% of the measurement.
    B, K = (16, 2) if quick else (4096, 512)

    @jax.jit
    def forward_many(params, key):
        def body(carry, k):
            ka, kv, kt = jax.random.split(k, 3)
            a = jax.random.normal(ka, (B, config.audio_dim), jnp.float32)
            v = jax.random.normal(kv, (B, config.video_dim), jnp.float32)
            t = jax.random.normal(kt, (B, config.text_dim), jnp.float32)
            mu, _ = forward(params, a, v, t)  # jit-in-jit inlines
            return carry, mu.mean()

        _, mus = jax.lax.scan(body, (), jax.random.split(key, K))
        return mus

    np.asarray(forward_many(params, jax.random.PRNGKey(0)))  # compile
    ft = []
    for i in range(1 if quick else 3):
        t0 = time.perf_counter()
        np.asarray(forward_many(params, jax.random.PRNGKey(i + 1)))
        ft.append(time.perf_counter() - t0)
    fwd_time = float(np.percentile(ft, 50))
    throughput = K * B / fwd_time

    _mark("pallas audio frontend")
    # --- Pallas audio front-end: 64 utterances per dispatch ---------------
    from tpu_deer.ops.audio_frontend import (
        AudioFrontendConfig,
        extract_utterance_features,
    )

    acfg = AudioFrontendConfig()
    # Amortization sweep (measured): 0.157 ms/utt at 256/dispatch, 0.074 at
    # 1024, 0.046 at 4096 — consistent with kernel ≈ 0.04 ms/utt plus the
    # tunnel RTT divided by the dispatch size. 1024 keeps the RTT share
    # under a third without a 786 MB resident signal buffer.
    N_UTT = 4 if quick else 1024
    utt_len = acfg.sample_rate // 2 if quick else acfg.sample_rate * 3
    sigs = jnp.asarray(rng.standard_normal((N_UTT, utt_len)), jnp.float32)
    fe = jax.jit(lambda s: jax.vmap(
        lambda x: extract_utterance_features(x, acfg))(s))
    np.asarray(fe(sigs))  # compile
    if quick:
        # The real run resolves to the fused Pallas kernel under this exact
        # vmap; on CPU the default is the conv path, so ALSO drive the
        # pallas path (interpret mode) through the same structure — this is
        # the program shape that crashed BENCH_r03.
        fe_pallas = jax.jit(lambda s: jax.vmap(
            lambda x: extract_utterance_features(
                x, acfg, use_pallas=True, interpret=True))(s))
        np.asarray(fe_pallas(sigs))
    fts = []
    for _ in range(1 if quick else 5):
        t0 = time.perf_counter()
        np.asarray(fe(sigs))
        fts.append((time.perf_counter() - t0) * 1e3 / N_UTT)
    fe_p50 = float(np.percentile(fts, 50))

    _mark("streaming sessions")
    # --- streaming: concurrent real-time sessions per chip ----------------
    # One push = one dispatch advancing S live audio streams by one 256 ms
    # chunk (incremental frontend + flagship forward). Real-time factor =
    # audio-seconds consumed per wall-second; that many concurrent live
    # streams fit on one chip at real time.
    from tpu_deer.stream import StreamingConfig, StreamingRecognizer

    S_STREAMS = 4 if quick else 256
    scfg = StreamingConfig()
    rec = StreamingRecognizer(model, params, n_streams=S_STREAMS, cfg=scfg)
    chunk_s = scfg.chunk_samples / scfg.frontend.sample_rate
    chunks = rng.standard_normal(
        (S_STREAMS, scfg.chunk_samples)
    ).astype(np.float32)
    rec.push(chunks)  # compile
    sts = []
    for _ in range(2 if quick else 10):
        t0 = time.perf_counter()
        out = rec.push(chunks)  # push() fetches to numpy (host sync)
        sts.append(time.perf_counter() - t0)
    stream_p50 = float(np.percentile(sts, 50))
    rtf = S_STREAMS * chunk_s / stream_p50

    _mark("train-step throughput")
    # --- train-step throughput: chained steps + ONE final loss fetch ------
    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig
    from tpu_deer.utils.profiling import (
        cost_analysis_summary,
        peak_flops_per_chip,
        peak_hbm_bandwidth,
        profile_training_speed,
        roofline_seconds,
    )

    # Step time is dispatch-bound below ~8k; 16384 saturates the chip.
    # Measured (chained steps, forced fetch): 36.7% MFU at 16384, 33.3% at
    # 32768, 27.5% at 65536 — bigger batches go HBM-bound, not faster.
    TRAIN_BS = 32 if quick else 16384
    splits = make_synthetic_splits(
        SyntheticConfig(n_train=TRAIN_BS * 2, n_val=8, n_test=8)
    )
    from tpu_deer.models.deer_model import create_complete_deer_model as _ccd

    _, train_params = _ccd(config, seed=0)
    trainer = DEERTrainer(
        model, train_params,
        TrainingConfig(batch_size=TRAIN_BS, num_epochs=1), steps_per_epoch=4,
    )
    # sync_per_step=False: chain all steps, force ONE final loss fetch —
    # honest total time (the fetch provably covers the whole chain), with
    # the tunnel round trip amortized over the steps.
    train_stats = profile_training_speed(
        trainer, ArrayDataset(splits["train"], "bench"),
        iters=3 if quick else 100,
        sync_per_step=False,
    )

    _mark("mfu/roofline accounting")
    # --- MFU + roofline accounting (XLA cost analysis: flops + bytes) -----
    peak = peak_flops_per_chip()
    hbm_bw = peak_hbm_bandwidth()
    fwd_cost = cost_analysis_summary(forward, params, *make_batch(B))
    train_batch = trainer._put(
        {k: v[:TRAIN_BS] for k, v in splits["train"].items()
         if k in ("audio", "video", "text", "labels")}
    )
    train_cost = cost_analysis_summary(
        trainer._train_step_impl, trainer.state, train_batch,
        jnp.asarray(1.0), jnp.asarray(1.0),
    )
    fwd_flops = fwd_cost["flops"] if fwd_cost else None
    train_flops = train_cost["flops"] if train_cost else None

    def mfu(flops_per_call, calls_per_sec):
        if not (peak and flops_per_call):
            return None
        return 100.0 * flops_per_call * calls_per_sec / peak

    def roofline(cost, secs_per_call):
        """% of the two-ceiling (MXU / HBM) roofline bound attained. The
        bandwidth ceiling uses XLA's per-op 'bytes accessed', an upper bound
        on true HBM traffic — so >100% means the program beats the naive
        traffic bound (XLA fusion keeps intermediates on-chip), and the true
        attainment lies between MFU and this figure."""
        if not (peak and hbm_bw and cost and secs_per_call):
            return None, None
        sol = roofline_seconds(cost["flops"], cost["bytes"], peak, hbm_bw)
        intensity = cost["flops"] / max(cost["bytes"], 1.0)
        return 100.0 * sol / secs_per_call, intensity

    mfu_fwd = mfu(fwd_flops, throughput / B)
    mfu_train = mfu(train_flops, train_stats["samples_per_sec"] / TRAIN_BS)
    rl_fwd, ai_fwd = roofline(fwd_cost, fwd_time / K)
    rl_train, ai_train = roofline(
        train_cost, train_stats["step_ms_mean"] / 1e3
    )
    fmt = lambda v: f"{v:.1f}%" if v is not None else "n/a"
    fmt_ai = lambda v: f"{v:.0f}" if v is not None else "n/a"

    peak_note = f" (peak {peak/1e12:.0f} TF bf16)" if peak else ""
    print(
        f"# platform={platform} params={n_params:,} dtype={compute_dtype} "
        f"p50/sample={p50:.3f}ms p99/sample={p99:.3f}ms (serving batch "
        f"{SERVE_B}, e2e fetch incl. tunnel) | batch-1 e2e {b1_p50:.1f}ms "
        f"(tunnel RTT floor {rtt_ms:.1f}ms) | "
        f"throughput={throughput:,.0f} samples/s/chip (batch {B} x{K} scan) "
        f"| train {train_stats['samples_per_sec']:,.0f} samples/s/chip "
        f"(bs {train_stats['batch_size']}) | "
        f"mfu_fwd={fmt(mfu_fwd)} mfu_train={fmt(mfu_train)}{peak_note}"
        + (
            f" | roofline_fwd={fmt(rl_fwd)} roofline_train={fmt(rl_train)} "
            f"vs XLA's per-op 'bytes accessed' bound, which over-counts true "
            f"HBM traffic — >100% is an artifact of that accounting, not "
            f"HBM-boundness (RESULTS_hbm.md: step is shape-bound; "
            f"intensity {fmt_ai(ai_fwd)}/{fmt_ai(ai_train)} "
            f"FLOP/B, ridge {peak / hbm_bw:.0f})"
            if peak and hbm_bw
            else ""
        ),
        file=sys.stderr,
    )
    print(
        f"# audio frontend (3s utt) p50 {fe_p50:.2f}ms/utt "
        f"({N_UTT}-utt dispatch)",
        file=sys.stderr,
    )
    print(
        f"# int8 serving p50/sample={p50_q:.3f}ms (batch {SERVE_B}; "
        f"f32 {p50:.3f}ms) | streaming: {rtf:,.0f}x real time "
        f"({S_STREAMS} live streams/push, {chunk_s*1e3:.0f}ms chunks, "
        f"push p50 {stream_p50*1e3:.1f}ms)",
        file=sys.stderr,
    )
    record = {
        "metric": "p50_per_sample_latency_ms",
        "value": round(p50, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / p50, 2),
    }
    if quick:
        # Structural smoke only: every section executed, timings meaningless.
        record = {"metric": "quick_structural_smoke", "value": 1.0,
                  "unit": "ok", "vs_baseline": None}
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(quick="--quick" in sys.argv[1:]))
