"""Production-scale MFU study: the framework's efficiency story past 4M params.

The flagship parity model (3.9M params, 256-wide layers) is SHAPE-bound on
a v5e (RESULTS_hbm.md: the step sits ~7x above the measured memory floor;
a bare matmul chain at its widths caps at ~34% MFU — width-256
contractions underfill the MXU pipeline). This experiment scales the SAME
architecture to production width (DEERModelConfig(encoder_dim/fusion_dim
scaled)) where the matmuls become MXU-bound, and measures train-step MFU +
roofline attainment per batch size on one real chip. Variants: the width-1
stacked batched-GEMM layout (models/stacked.py — the shape-ceiling attack)
and bf16 parameter storage at the traffic-sensitive width-8 point.
Writes experiments/RESULTS_scale.md.

Usage (TPU): python experiments/scale_mfu.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(width_mult: int, batch_sizes, iters: int,
            storage_dtype: str = "float32",
            stacked: bool = False) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from tpu_deer.data.pipeline import ArrayDataset
    from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        count_parameters,
        create_complete_deer_model,
    )
    from tpu_deer.train.trainer import DEERTrainer, TrainingConfig
    from tpu_deer.utils.profiling import (
        cost_analysis_summary,
        peak_flops_per_chip,
        peak_hbm_bandwidth,
        profile_training_speed,
        roofline_seconds,
    )

    platform = jax.devices()[0].platform
    config = DEERModelConfig(
        encoder_dim=256 * width_mult,
        fusion_dim=512 * width_mult,
        compute_dtype="bfloat16" if platform != "cpu" else "float32",
        stacked_compute=stacked,
    )
    model, params = create_complete_deer_model(config, seed=0)
    n_params = count_parameters(params)
    peak = peak_flops_per_chip()
    hbm_bw = peak_hbm_bandwidth()

    rows = []
    max_bs = max(batch_sizes)
    splits = make_synthetic_splits(
        SyntheticConfig(n_train=max_bs * 2, n_val=8, n_test=8)
    )
    ds = ArrayDataset(splits["train"], "scale")
    for bs in batch_sizes:
        _, p = create_complete_deer_model(config, seed=0)
        trainer = DEERTrainer(
            model, p,
            TrainingConfig(batch_size=bs, num_epochs=1,
                           storage_dtype=storage_dtype),
            steps_per_epoch=4,
        )
        t0 = time.time()
        stats = profile_training_speed(
            trainer, ds, iters=iters, sync_per_step=False
        )
        wall = time.time() - t0
        batch = trainer._put(
            {k: v[:bs] for k, v in splits["train"].items()
             if k in ("audio", "video", "text", "labels")}
        )
        cost = cost_analysis_summary(
            trainer._train_step_impl, trainer.state, batch,
            jnp.asarray(1.0), jnp.asarray(1.0),
        )
        step_s = stats["step_ms_mean"] / 1e3
        row = {
            "batch_size": bs,
            "storage": storage_dtype,
            "stacked": stacked,
            "params": n_params,
            "step_ms": stats["step_ms_mean"],
            "samples_per_sec": stats["samples_per_sec"],
            "mfu_pct": (
                100.0 * cost["flops"] / (step_s * peak)
                if cost and peak else None
            ),
            "roofline_pct": (
                100.0 * roofline_seconds(
                    cost["flops"], cost["bytes"], peak, hbm_bw
                ) / step_s
                if cost and peak and hbm_bw else None
            ),
            "intensity": (
                cost["flops"] / max(cost["bytes"], 1.0) if cost else None
            ),
        }
        rows.append(row)
        fmt = lambda v: f"{v:.1f}" if v is not None else "n/a"
        print(
            f"  bs={bs}: {stats['samples_per_sec']:,.0f} samples/s, "
            f"step {stats['step_ms_mean']:.2f} ms, mfu {fmt(row['mfu_pct'])}%"
            f", roofline {fmt(row['roofline_pct'])}%, "
            f"intensity {fmt(row['intensity'])} FLOP/B "
            f"({wall:.0f}s incl. compile)",
            file=sys.stderr,
        )
        # Keep device memory in check between configs through the tunnel.
        del trainer, p
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="CPU-sized smoke (tiny widths/batches)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    if args.quick or platform == "cpu":
        plans = [
            (1, [64, 128], "float32", False),
            (1, [128], "float32", True),
        ]
        iters = 3
    else:
        # width_mult 4 → encoder 1024 / fusion 2048 (~62M params); width 8
        # → ~240M params, where arithmetic intensity crosses the ridge and
        # the step becomes MXU-bound (measured ~70% MFU at bs 8192).
        # Variants: width-1 stacked layout (shape-ceiling attack, VERDICT
        # r4 #4); width-8 bf16 storage (does halving param bytes pay where
        # roofline <100%? — VERDICT r4 #3).
        plans = [
            (1, [16384], "float32", False),
            (1, [16384], "float32", True),
            (4, [2048, 4096, 8192, 16384], "float32", False),
            (8, [4096, 8192], "float32", False),
            (8, [8192], "bfloat16", False),
        ]
        iters = args.iters

    all_rows = []
    for width_mult, batch_sizes, storage, stacked in plans:
        print(f"width_mult={width_mult} storage={storage} "
              f"stacked={stacked}:", file=sys.stderr)
        all_rows.append((width_mult, measure(
            width_mult, batch_sizes, iters,
            storage_dtype=storage, stacked=stacked,
        )))

    # Never clobber the committed full-run artifact with a smoke.
    quick_run = args.quick or platform == "cpu"
    out = Path(__file__).parent / (
        "RESULTS_scale_quick.md" if quick_run else "RESULTS_scale.md"
    )
    lines = [
        "# Production-scale MFU study — computed results",
        "",
        f"- platform: **{platform}**, one chip; train step = fwd + NIG loss "
        f"+ bwd + AdamW update, chained dispatches with one forcing fetch "
        f"(bench.py timing discipline).",
        "- The parity-size model (width 1) is **shape-bound, not "
        "HBM-bound** (measured in `RESULTS_hbm.md`: the step sits ~7x "
        "above the memory floor at the measured ~500 GB/s, and a bare "
        "matmul chain at these layer widths caps at ~34% MFU — width-256 "
        "contractions underfill a 128x128-tile MXU pipeline). The "
        "'roofline' column is attainment vs XLA's per-op 'bytes accessed' "
        "bound, which over-counts true HBM traffic; values >100% are an "
        "artifact of that accounting, not evidence of a bandwidth limit. "
        "At production width the matmuls push intensity toward the v5e "
        "ridge (~240 FLOP/B) and MFU becomes the binding number.",
        "- 'stacked' = the batched-GEMM layout (models/stacked.py): the "
        "three encoder trunks + three DEER heads as batched dot_generals, "
        "3x the work per MXU dispatch (output equality pinned by "
        "tests/test_stacked.py).",
        "",
        "| width | params | batch | storage | layout | samples/s | step ms "
        "| MFU | roofline | FLOP/B |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for wm, rows in all_rows:
        for r in rows:
            pct = lambda v: f"{v:.1f}%" if v is not None else "n/a"
            raw = lambda v: f"{v:.1f}" if v is not None else "n/a"
            layout = "stacked" if r["stacked"] else "default"
            storage = "bf16" if r["storage"] == "bfloat16" else "f32"
            lines.append(
                f"| {wm} | {r['params']:,} | {r['batch_size']} "
                f"| {storage} | {layout} "
                f"| {r['samples_per_sec']:,.0f} | {r['step_ms']:.2f} "
                f"| {pct(r['mfu_pct'])} | {pct(r['roofline_pct'])} "
                f"| {raw(r['intensity'])} |"
            )
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
