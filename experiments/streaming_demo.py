"""Streaming capacity study: concurrent real-time sessions on one chip.

Demonstrates the live-audio path (`tpu_deer/stream.py`) at serving scale:
S concurrent streams advance by one 256 ms chunk per push — incremental
frontend + flagship forward in ONE jitted dispatch — and the study reports
the real-time factor (audio-seconds consumed per wall-second) across S.
A chip sustains S live sessions iff RTF(S) >= S.

Also validates correctness at scale: after the pushes, each stream's
incremental 84-d features are compared against the offline extractor
(`extract_utterance_features`) on the same audio.

Timing discipline (CLAUDE.md): the tunnel acks block_until_ready locally,
so every push timing is covered by `StreamingRecognizer.push`'s host fetch
(np.asarray of the outputs).

Writes experiments/RESULTS_stream.md.

Usage:  python experiments/streaming_demo.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def speech_like(rng: np.random.Generator, n: int, seconds: float, sr: int):
    """[n, T] synthetic speech-like signals with per-stream prosody."""
    t = np.arange(int(seconds * sr)) / sr
    out = np.empty((n, t.size), np.float32)
    for i in range(n):
        base = rng.uniform(90.0, 220.0)
        vib = rng.uniform(10.0, 60.0)
        f0 = base + vib * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * t)
        sig = np.zeros_like(t)
        for h in range(1, 5):
            sig += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
        sig *= 0.4 + 0.6 * np.sin(2 * np.pi * rng.uniform(0.8, 2.0) * t) ** 2
        out[i] = sig + 0.05 * rng.normal(size=t.shape)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="CPU smoke sizes")
    ap.add_argument("--seconds", type=float, default=2.56)
    args = ap.parse_args()

    import jax

    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        create_complete_deer_model,
    )
    from tpu_deer.ops.audio_frontend import extract_utterance_features
    from tpu_deer.stream import StreamingConfig, StreamingRecognizer

    platform = jax.devices()[0].platform
    scfg = StreamingConfig()
    sr = scfg.frontend.sample_rate
    chunk_s = scfg.chunk_samples / sr
    model, params = create_complete_deer_model(
        DEERModelConfig(
            compute_dtype="bfloat16" if platform != "cpu" else "float32"
        ),
        seed=0,
    )

    sizes = [2, 4] if args.quick else [64, 256, 1024, 4096]
    rng = np.random.default_rng(0)
    n_chunks = max(2, int(args.seconds * sr) // scfg.chunk_samples)
    rows = []
    check_corr = None
    for S in sizes:
        rec = StreamingRecognizer(model, params, n_streams=S, cfg=scfg)
        audio = speech_like(rng, S, n_chunks * chunk_s, sr)
        rec.push(audio[:, : scfg.chunk_samples])  # compile + warm
        rec.reset_streams(np.arange(S))
        times = []
        for c in range(n_chunks):
            sl = audio[:, c * scfg.chunk_samples : (c + 1) * scfg.chunk_samples]
            t0 = time.perf_counter()
            out = rec.push(sl)
            times.append(time.perf_counter() - t0)
        p50 = float(np.percentile(times, 50))
        rtf = S * chunk_s / p50
        rows.append((S, p50 * 1e3, rtf, rtf >= S))
        print(
            f"S={S:5d}: push p50 {p50*1e3:7.1f} ms  RTF {rtf:12,.0f}x "
            f"{'(sustains all S live)' if rtf >= S else ''}",
            flush=True,
        )
        if check_corr is None:
            # Correctness at scale: streaming features vs offline extractor.
            used = audio[:, : n_chunks * scfg.chunk_samples]
            offline = np.stack(
                [
                    np.asarray(
                        extract_utterance_features(used[i], scfg.frontend)
                    )
                    for i in range(min(S, 8))
                ]
            )
            got = out["features"][: offline.shape[0]]
            check_corr = float(
                np.mean(
                    [
                        np.corrcoef(got[i], offline[i])[0, 1]
                        for i in range(offline.shape[0])
                    ]
                )
            )
            print(f"  feature corr vs offline extractor: {check_corr:.4f}")

    # --- device-source capacity: compute-only RTF ------------------------
    # The e2e numbers above include pushing raw PCM through the dev
    # environment's WAN tunnel (~17 MB/s) — in production the audio
    # reaches the serving host over the network and crosses to the TPU on
    # PCIe. This variant generates chunks on device and chains K ticks in
    # one lax.scan dispatch (one final fetch), isolating what the CHIP
    # sustains.
    import jax
    import jax.numpy as jnp

    from tpu_deer.stream import init_stream_state, streaming_update

    S_dev = sizes[-1]
    K = 4 if args.quick else 32
    state0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S_dev,) + x.shape),
        init_stream_state(scfg),
    )
    zeros_v = jnp.zeros((S_dev, model.config.video_dim), jnp.float32)
    zeros_t = jnp.zeros((S_dev, model.config.text_dim), jnp.float32)

    @jax.jit
    def many_ticks(params, state, key):
        def body(carry, k):
            chunks = jax.random.normal(
                k, (S_dev, scfg.chunk_samples), jnp.float32
            )
            carry, feats = jax.vmap(
                lambda s, c: streaming_update(s, c, scfg)
            )(carry, chunks)
            out = model.apply(
                {"params": params}, feats, zeros_v, zeros_t,
                deterministic=True,
            )
            return carry, out["mu_all"].mean()

        state, mus = jax.lax.scan(body, state, jax.random.split(key, K))
        return mus

    np.asarray(many_ticks(params, state0, jax.random.PRNGKey(0)))  # compile
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(many_ticks(params, state0, jax.random.PRNGKey(i + 1)))
        dts.append(time.perf_counter() - t0)
    dev_t = float(np.percentile(dts, 50))
    dev_rtf = K * S_dev * chunk_s / dev_t
    print(
        f"device-source capacity: {dev_rtf:,.0f}x real time "
        f"({S_dev} streams x {K} ticks per dispatch)"
    )

    best = max(r[2] for r in rows)
    # Never clobber the committed full-run artifact with a smoke.
    out_name = "RESULTS_stream_quick.md" if args.quick else "RESULTS_stream.md"
    out_path = os.path.join(os.path.dirname(__file__), out_name)
    with open(out_path, "w") as f:
        f.write("# Streaming real-time capacity — computed results\n\n")
        f.write(
            f"- platform: **{platform}**, {n_chunks} chunks x "
            f"{chunk_s*1e3:.0f} ms per stream; flagship model in the loop\n"
            f"- one push = one jitted dispatch: incremental frontend + "
            f"forward for ALL streams (tpu_deer/stream.py)\n"
            f"- streaming features match the offline extractor: mean "
            f"correlation **{check_corr:.4f}**\n"
            f"- the reference has no streaming path at all (offline "
            f"librosa per-file loops, preprocessing.py:510-615)\n\n"
        )
        f.write("| concurrent streams S | push p50 (ms) | real-time factor "
                "| sustains S live sessions |\n|---|---|---|---|\n")
        for S, ms, rtf, ok in rows:
            f.write(f"| {S} | {ms:.1f} | {rtf:,.0f}x | "
                    f"{'yes' if ok else 'no'} |\n")
        f.write(
            f"\nPeak e2e: **{best:,.0f}x real time** through the dev "
            "tunnel (raw PCM crosses a ~17 MB/s WAN link per push — the "
            "e2e ceiling is the link, not the chip).\n\n"
            f"Device-source capacity (chunks generated on device, {K} "
            f"ticks x {S_dev} streams chained per dispatch, one fetch): "
            f"**{dev_rtf:,.0f}x real time** — the chip itself sustains "
            f"~{dev_rtf:,.0f} concurrent live sessions.\n"
        )
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
