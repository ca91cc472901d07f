"""Kernel-level benchmarks: Pallas kernels vs their XLA-lowered baselines.

Answers "are the hot kernels at speed of light?" with measured numbers on
the real chip, for the two custom Pallas paths in the framework:

  1. flash attention (ops/flash_attention.py) vs the einsum+softmax SDPA
     XLA baseline — forward and forward+backward, across sequence lengths.
     The XLA baseline materializes the [Tq, Tk] score matrix (O(T^2)
     memory); the flash kernels stream K/V blocks (O(T*D)) — the point is
     matching/beating XLA *while* removing the quadratic memory term.
  2. the fused MFCC front-end kernel (ops/audio_frontend.py) vs its
     pure-jnp XLA twin — same math, one fused VMEM-resident kernel vs
     XLA's own fusion choices.

Timing discipline (CLAUDE.md): the tunnel acks block_until_ready locally,
so every measurement chains K iterations inside one jitted lax.scan with
inputs generated on device and forces ONE host fetch of a scalar reduced
from the outputs; the ~28 ms tunnel round trip amortizes over the chain.

Writes experiments/RESULTS_kernels.md.

Usage: python experiments/kernel_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_chain(fn, n_rep=3):
    """fn() must dispatch the whole chain and host-fetch one value."""
    fn()  # compile + warm
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="CPU smoke: tiny shapes, interpret-mode kernels")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_deer.ops.audio_frontend import AudioFrontendConfig, mfcc_frames
    from tpu_deer.ops.flash_attention import flash_attention

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    K = 4 if args.quick else 64

    # ---- 1. attention: flash (Pallas) vs einsum SDPA (XLA) --------------
    def sdpa_ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)

    shapes = (
        [(1, 2, 256, 64)] if args.quick
        else [(8, 8, 1024, 64), (2, 8, 4096, 64), (1, 8, 8192, 64)]
    )
    attn_rows = []
    for B, H, T, D in shapes:
        flops_fwd = 4.0 * B * H * T * T * D  # QK^T + PV, mul+add
        row = {"shape": f"B{B} H{H} T{T} D{D}"}
        for name, attn in (
            ("flash", lambda q, k, v: flash_attention(
                q, k, v, interpret=interpret)),
            ("xla", sdpa_ref),
        ):
            @jax.jit
            def chain_fwd(key, attn=attn):
                def body(c, k_):
                    kq, kk, kv = jax.random.split(k_, 3)
                    q = jax.random.normal(kq, (B, H, T, D), jnp.float32)
                    k = jax.random.normal(kk, (B, H, T, D), jnp.float32)
                    v = jax.random.normal(kv, (B, H, T, D), jnp.float32)
                    return c, attn(q, k, v).mean()
                _, outs = jax.lax.scan(body, (), jax.random.split(key, K))
                return outs.sum()

            @jax.jit
            def chain_bwd(key, attn=attn):
                def loss(q, k, v):
                    return attn(q, k, v).mean()
                def body(c, k_):
                    kq, kk, kv = jax.random.split(k_, 3)
                    q = jax.random.normal(kq, (B, H, T, D), jnp.float32)
                    k = jax.random.normal(kk, (B, H, T, D), jnp.float32)
                    v = jax.random.normal(kv, (B, H, T, D), jnp.float32)
                    l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                        q, k, v)
                    return c, l + sum(g.mean() for g in grads)
                _, outs = jax.lax.scan(body, (), jax.random.split(key, K))
                return outs.sum()

            t_fwd = _timed_chain(
                lambda f=chain_fwd: np.asarray(f(jax.random.PRNGKey(0)))
            ) / K
            t_bwd = _timed_chain(
                lambda f=chain_bwd: np.asarray(f(jax.random.PRNGKey(1)))
            ) / K
            row[f"{name}_fwd_ms"] = t_fwd * 1e3
            row[f"{name}_fwd_tflops"] = flops_fwd / t_fwd / 1e12
            row[f"{name}_bwd_ms"] = t_bwd * 1e3
            # fwd+bwd ~ 3.5x fwd FLOPs (FlashAttention-2 accounting)
            row[f"{name}_bwd_tflops"] = 3.5 * flops_fwd / t_bwd / 1e12
        # use_flash="auto" dispatches to exactly one of the two measured
        # executables per phase (resolve_use_flash crossovers), so the auto
        # row is the measured time of the picked path — re-timing the same
        # jitted kernel a third time would only add noise.
        from tpu_deer.ops.flash_attention import resolve_use_flash

        for phase, training in (("fwd", False), ("bwd", True)):
            pick = "flash" if resolve_use_flash("auto", T, training=training) \
                else "xla"
            row[f"auto_{phase}_pick"] = pick
            row[f"auto_{phase}_ms"] = row[f"{pick}_{phase}_ms"]
        attn_rows.append(row)
        print(
            f"attention {row['shape']}: "
            f"flash fwd {row['flash_fwd_ms']:.2f}ms "
            f"({row['flash_fwd_tflops']:.1f} TF/s) vs xla "
            f"{row['xla_fwd_ms']:.2f}ms ({row['xla_fwd_tflops']:.1f}); "
            f"fwd+bwd flash {row['flash_bwd_ms']:.2f}ms vs xla "
            f"{row['xla_bwd_ms']:.2f}ms; auto picks "
            f"{row['auto_fwd_pick']}/{row['auto_bwd_pick']}",
            flush=True,
        )

    # ---- 2. MFCC frontend: fused Pallas kernel vs jnp/XLA twin ----------
    # The Pallas path is swept over frame-block sizes (the flash lesson:
    # block size is a first-order knob; measure, don't guess).
    acfg = AudioFrontendConfig()
    N = 256 if args.quick else 16384  # frames per call
    variants = [("xla", False, None)]
    if platform != "cpu":  # no CPU interpreter run for perf (correctness
        # is covered by tests/test_audio_frontend.py)
        variants = [
            (f"pallas-b{b}", True, b) for b in (128, 256, 512, 1024)
        ] + variants
    mfcc_rows = []
    for name, use_pallas, blk in variants:
        @jax.jit
        def chain(key, up=use_pallas, blk=blk):
            def body(c, k_):
                frames = jax.random.normal(k_, (N, acfg.n_fft), jnp.float32)
                mfcc, logmel, power = mfcc_frames(
                    frames, acfg, use_pallas=up, block_frames=blk)
                return c, mfcc.mean() + logmel.mean() + power.mean()
            _, outs = jax.lax.scan(body, (), jax.random.split(key, K))
            return outs.sum()

        t = _timed_chain(
            lambda f=chain: np.asarray(f(jax.random.PRNGKey(2)))
        ) / K
        # DFT (2 matmuls) + mel + DCT, mul+add counting:
        flops = 2.0 * N * (
            2 * acfg.n_fft * (acfg.n_fft // 2 + 1)
            + (acfg.n_fft // 2 + 1) * acfg.n_mels
            + acfg.n_mels * acfg.n_mfcc
        )
        mfcc_rows.append({
            "name": name, "ms": t * 1e3, "tflops": flops / t / 1e12,
            "us_per_frame": t * 1e6 / N,
        })
        print(f"mfcc[{name}] {N} frames: {t*1e3:.2f}ms "
              f"({flops/t/1e12:.1f} TF/s, {t*1e6/N:.2f}us/frame)", flush=True)

    # ---- 3. front-end FROM RAW SIGNAL: fused framing paths ---------------
    # The r2 verdict's real finding was that the frames-input kernel has
    # nothing left to win: XLA already fuses window->DFT->mel->DCT into
    # matmul chains. The HBM cost XLA *can't* avoid is upstream — the
    # gather that materializes overlapping frames (4x the signal) before
    # any math. mfcc_from_signal starts from the raw signal instead:
    #   pallas — manual-DMA kernel rebuilds frames in VMEM (framing never
    #            touches HBM), then the full chain to MFCC+timefeats;
    #   conv   — framing+window+DFT as one strided convolution (XLA/MXU);
    #   frames — the legacy gather + mfcc_frames baseline.
    from tpu_deer.ops.audio_frontend import mfcc_from_signal

    B = 4 if args.quick else 64
    T = 16384 if args.quick else 65536  # ~1 s / ~4 s at 16 kHz
    n_frames_sig = T // acfg.hop_length + 1
    sig_variants = [("frames", "frames", None), ("conv", "conv", None)]
    if platform != "cpu":
        sig_variants = [
            (f"pallas-b{b}", "pallas", b) for b in (128, 256, 512)
        ] + sig_variants
    sig_rows = []
    for name, path, blk in sig_variants:
        @jax.jit
        def chain(key, path=path, blk=blk):
            def body(c, k_):
                sig = jax.random.normal(k_, (B, T), jnp.float32)
                mfcc, logmel, power, tf = mfcc_from_signal(
                    sig, acfg, path=path, block_frames=blk)
                return c, mfcc.mean() + logmel.mean() + tf.mean()
            _, outs = jax.lax.scan(body, (), jax.random.split(key, K))
            return outs.sum()

        t = _timed_chain(
            lambda f=chain: np.asarray(f(jax.random.PRNGKey(3)))
        ) / K
        total_frames = B * n_frames_sig
        flops = 2.0 * total_frames * (
            2 * acfg.n_fft * (acfg.n_fft // 2 + 1)
            + (acfg.n_fft // 2 + 1) * acfg.n_mels
            + acfg.n_mels * acfg.n_mfcc
        )
        sig_rows.append({
            "name": name, "ms": t * 1e3, "tflops": flops / t / 1e12,
            "us_per_frame": t * 1e6 / total_frames,
            "rt_factor": (B * T / 16000.0) / t,
        })
        print(f"signal[{name}] B{B}xT{T}: {t*1e3:.2f}ms "
              f"({flops/t/1e12:.1f} TF/s, {t*1e6/total_frames:.3f}us/frame, "
              f"{sig_rows[-1]['rt_factor']:.0f}x realtime)", flush=True)

    # ---- report ---------------------------------------------------------
    # Never clobber the committed full-run artifact with a smoke.
    out_name = "RESULTS_kernels_quick.md" if args.quick else "RESULTS_kernels.md"
    out_path = os.path.join(os.path.dirname(__file__), out_name)
    with open(out_path, "w") as f:
        f.write("# Kernel benchmarks — Pallas vs XLA baselines\n\n")
        f.write(
            f"- platform: **{platform}**, f32, {K}-iteration scan chains "
            "with one host fetch (CLAUDE.md timing discipline)\n"
            "- flash attention streams K/V blocks through VMEM "
            "(O(T·D) memory); the XLA SDPA baseline materializes the "
            "[T,T] score matrix\n\n"
        )
        f.write("## Attention (forward / forward+backward)\n\n")
        f.write("| shape | flash fwd | XLA fwd | flash fwd ms | XLA fwd ms "
                "| flash f+b ms | XLA f+b ms | auto (fwd/f+b) |\n"
                "|---|---|---|---|---|---|---|---|\n")
        for r in attn_rows:
            f.write(
                f"| {r['shape']} | {r['flash_fwd_tflops']:.1f} TF/s | "
                f"{r['xla_fwd_tflops']:.1f} TF/s | "
                f"{r['flash_fwd_ms']:.2f} | {r['xla_fwd_ms']:.2f} | "
                f"{r['flash_bwd_ms']:.2f} | {r['xla_bwd_ms']:.2f} | "
                f"{r['auto_fwd_pick']} {r['auto_fwd_ms']:.2f} / "
                f"{r['auto_bwd_pick']} {r['auto_bwd_ms']:.2f} |\n"
            )
        if attn_rows:
            auto_ok = all(
                r[f"auto_{p}_ms"] <= min(r[f"flash_{p}_ms"],
                                         r[f"xla_{p}_ms"]) + 1e-9
                for r in attn_rows for p in ("fwd", "bwd")
            )
            f.write(
                "\nuse_flash=\"auto\" (the default in models/attention.py) "
                "resolves to one of the two measured kernels per phase via "
                "the crossover thresholds in ops/flash_attention.py; its "
                "column is the measured time of the picked path. Verdict: "
                + ("auto matches the faster fixed choice at every shape "
                   "and phase above." if auto_ok else
                   "MISPICK — a crossover threshold disagrees with this "
                   "run's measurements; re-tune FLASH_AUTO_*_T.")
                + "\n"
            )
        if mfcc_rows:
            f.write("\n## Fused MFCC front-end (framing already done; "
                    "window->DFT->mel->log->DCT)\n\n")
            f.write("| path | ms / call | us / frame | attained |\n"
                    "|---|---|---|---|\n")
            for r in mfcc_rows:
                f.write(f"| {r['name']} | {r['ms']:.2f} | "
                        f"{r['us_per_frame']:.2f} | {r['tflops']:.1f} TF/s |\n")
        if sig_rows:
            f.write("\n## Front-end from RAW SIGNAL (framing + window + DFT "
                    "+ mel + log + DCT + RMS/ZCR)\n\n")
            f.write(f"B={B} signals x T={T} samples "
                    f"({n_frames_sig} frames each). The gather-based "
                    "baseline materializes overlapping frames (4x signal "
                    "bytes) in HBM before any math; 'conv' folds framing+"
                    "window+DFT into one strided MXU convolution; 'pallas' "
                    "rebuilds frames in VMEM via manual DMA so framing "
                    "never touches HBM.\n\n")
            f.write("| path | ms / call | us / frame | attained | x realtime |\n"
                    "|---|---|---|---|---|\n")
            for r in sig_rows:
                f.write(f"| {r['name']} | {r['ms']:.2f} | "
                        f"{r['us_per_frame']:.3f} | {r['tflops']:.1f} TF/s | "
                        f"{r['rt_factor']:.0f} |\n")
            best_p = min((r for r in sig_rows if r["name"].startswith("pallas")),
                         key=lambda r: r["ms"], default=None)
            best_x = min((r for r in sig_rows
                          if not r["name"].startswith("pallas")),
                         key=lambda r: r["ms"], default=None)
            if best_p and best_x:
                f.write(
                    f"\nFrom-signal verdict: fused Pallas "
                    f"{best_x['ms']/best_p['ms']:.1f}x the best XLA "
                    "alternative. The frames-input kernel (table above) ties "
                    "XLA — both are matmul-chain bound once frames exist; "
                    "the HBM cost lives in the framing gather, which is why "
                    "the win moved upstream. mfcc_from_signal defaults to "
                    "the Pallas path on TPU.\n")
        f.write("\nThe flash kernels exist for their O(T) memory scaling — "
                "matching the XLA baseline's wall clock while never "
                "materializing the quadratic score matrix is the win; "
                "beating it is a bonus.\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
