#!/usr/bin/env python
"""Measure the stacked (batched-GEMM) compute path vs the default layout.

VERDICT r4 weak #7: the width-1 train step sits at 32-37% MFU with the
shape ceiling measured (bare width-256 matmul chain: 34.2%) but never
attacked. models/stacked.py restructures the three independent modality
encoder chains and the three DEER heads into batched dot_generals
(3x the work per MXU dispatch, identical math — equality pinned by
tests/test_stacked.py). This study measures whether that moves the step.

Times the full train step (fwd + loss + bwd + clip + adamw — the
`adamw` stage of experiments/bf16_diag.py) and the bare forward for both
layouts at the bench batch size, with MFU from XLA cost analysis.

Writes experiments/RESULTS_stacked.{json,md}. Run:
python experiments/stacked_bench.py (TPU ~5 min; --quick CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(HERE, "RESULTS_stacked"))
    args = ap.parse_args(argv)
    if args.quick:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        args.batch, args.k, args.reps = 256, 2, 1
        args.out += "_quick"

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

    from experiments.bf16_diag import build_step, time_variant
    from tpu_deer.utils.profiling import peak_flops_per_chip

    peak = peak_flops_per_chip()
    rows = []
    t0 = time.time()
    for variant in ("fwd", "adamw"):
        row = {"variant": variant}
        for stacked in (False, True):
            step, carry, _ = build_step(
                variant, "float32", args.batch, stacked=stacked
            )
            ms = time_variant(step, carry, args.k, args.reps)
            key = "stacked" if stacked else "default"
            row[key] = ms
            row[f"{key}_samples_per_sec"] = args.batch / (ms / 1e3)
            print(f"{variant:>6} {key:>8}: {ms:7.2f} ms/step "
                  f"({row[f'{key}_samples_per_sec']:,.0f} samples/s)",
                  file=sys.stderr, flush=True)
        row["speedup"] = row["default"] / row["stacked"]
        rows.append(row)

    # MFU for the train step via XLA cost analysis on the default layout
    # (identical math → identical FLOPs for both layouts).
    flops = None
    try:
        step, carry, _ = build_step("adamw", "float32", args.batch)
        lowered = step.lower(carry, jax.random.PRNGKey(0))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    train = next(r for r in rows if r["variant"] == "adamw")
    mfu = {}
    if flops and peak:
        for key in ("default", "stacked"):
            mfu[key] = 100.0 * flops / (train[key] / 1e3) / peak
        print(f"train MFU: default {mfu['default']:.1f}% "
              f"stacked {mfu['stacked']:.1f}%", file=sys.stderr)

    payload = {
        "platform": platform, "batch": args.batch, "k": args.k,
        "elapsed_s": time.time() - t0, "rows": rows,
        "train_flops_per_step": flops, "train_mfu_pct": mfu or None,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "# Stacked batched-GEMM layout — measured (width-1 shape-ceiling attack)",
        "",
        f"- platform: **{platform}**, batch {args.batch}, {args.k} chained "
        f"steps per timing, forced-fetch, {payload['elapsed_s']:.0f}s total.",
        "- 'stacked' = models/stacked.py (3 encoder trunks + 3 DEER heads "
        "as batched dot_generals; output equality pinned by "
        "tests/test_stacked.py). 'default' = the reference-layout forward.",
        "",
        "| stage | default ms | stacked ms | speedup |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['variant']} | {r['default']:.2f} | {r['stacked']:.2f} "
            f"| {r['speedup']:.2f}x |"
        )
    if mfu:
        lines += [
            "",
            f"Train-step MFU (XLA-cost-analysis FLOPs / wall): default "
            f"**{mfu['default']:.1f}%**, stacked **{mfu['stacked']:.1f}%**.",
        ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out + ".md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
