#!/usr/bin/env python
"""Diagnose the bf16-parameter-storage train-step slowdown (VERDICT r4 #3).

RESULTS_hbm.md §3 measured the width-1 train step at 7.08 ms with f32
parameter storage but 19.12 ms with bf16 storage — backwards (half the
param/grad/moment bytes should not cost 2.7x) and shipped as a bare table
row. This study bisects the step into stages and times each with f32 vs
bf16 parameter storage to localize the mechanism:

  fwd        — jitted forward + loss only
  grad       — value_and_grad (fwd + bwd), no optimizer
  sgd        — fwd + bwd + sgd update (no moments, no clip)
  clip+sgd   — adds global-norm clip (isolates the clip's tree reduction)
  adamw      — fwd + bwd + clip + adamw (the real step's optimizer shape)
  adamw-f32opt — same, but gradients are cast to f32 entering the
                 optimizer and moments/updates live in f32 (master-moment
                 pattern); updates cast back to storage dtype at apply.

If the slowdown localizes to `adamw` but not `adamw-f32opt`, the mechanism
is bf16 optimizer arithmetic (XLA's bf16 elementwise pipeline on the
moment trees), and the fix is f32 optimizer state under bf16 params.
If it localizes to `grad`, the mechanism is the backward's bf16 param
handling (e.g. transpose/convert placement), not the optimizer.

Writes experiments/RESULTS_bf16_diag.{json,md} and appends nothing
anywhere else. Run: python experiments/bf16_diag.py (TPU ~6 min;
--quick CPU structural smoke).
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


def build_step(variant: str, storage: str, batch: int, stacked: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_deer.core import losses as loss_lib
    from tpu_deer.models.deer_model import (
        DEERModelConfig,
        create_complete_deer_model,
    )

    platform = jax.devices()[0].platform
    config = DEERModelConfig(
        compute_dtype="bfloat16" if platform != "cpu" else "float32",
        stacked_compute=stacked,
    )
    model, params = create_complete_deer_model(config, seed=0)
    if storage != "float32":
        sd = jnp.dtype(storage)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(sd)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    batch_arrays = {
        "audio": rng.standard_normal((batch, 84)).astype(np.float32),
        "video": rng.standard_normal((batch, 256)).astype(np.float32),
        "text": rng.standard_normal((batch, 768)).astype(np.float32),
        "labels": np.tanh(rng.standard_normal((batch, 3))).astype(np.float32),
    }
    batch_arrays = jax.device_put(batch_arrays)

    def loss_fn(p, key):
        out = model.apply(
            {"params": p},
            batch_arrays["audio"], batch_arrays["video"],
            batch_arrays["text"],
            deterministic=False, rngs={"dropout": key},
        )
        ps = [out[f"{n}_params"] for n in config.dim_names]
        return loss_lib.multi_task_deer_loss(
            ps, batch_arrays["labels"], loss_lib.DEERLossConfig()
        )["total_loss"]

    lr = 1e-3
    if variant == "adamw":
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lr, weight_decay=1e-5),
        )
    elif variant == "adamw-f32opt":
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lr, weight_decay=1e-5),
        )
    elif variant == "clip+sgd":
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(lr))
    elif variant == "sgd":
        tx = optax.sgd(lr)
    else:
        tx = None

    f32opt = variant == "adamw-f32opt"
    if tx is not None:
        opt_init_tree = (
            jax.tree_util.tree_map(
                lambda p: p.astype(jnp.float32)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
            if f32opt else params
        )
        opt_state = jax.device_put(tx.init(opt_init_tree))

    if variant == "fwd":

        @jax.jit
        def step(p, key):
            return p, loss_fn(p, key)

        return step, params, platform

    if variant == "grad":

        @jax.jit
        def step(p, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, key)
            # Consume grads so XLA can't elide the backward.
            return p, loss + 0.0 * optax.global_norm(grads)

        return step, params, platform

    @jax.jit
    def step(carry, key):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        if f32opt:
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32)
                if jnp.issubdtype(g.dtype, jnp.floating) else g,
                grads,
            )
            p32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                p,
            )
            updates, s = tx.update(grads, s, p32)
            updates = jax.tree_util.tree_map(
                lambda u, pp: u.astype(pp.dtype), updates, p
            )
        else:
            updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    return step, (params, opt_state), platform


def time_variant(step, carry, k: int, reps: int):
    import jax

    keys = jax.random.split(jax.random.PRNGKey(0), k)
    # Warm + compile.
    c = carry
    c, loss = step(c, keys[0])
    np.asarray(loss)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = carry
        last = None
        for i in range(k):
            c, last = step(c, keys[i])
        np.asarray(last)  # force through the tunnel
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times) * 1e3)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--k", type=int, default=30, help="steps per timing")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(HERE, "RESULTS_bf16_diag"))
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

    variants = ["fwd", "grad", "sgd", "clip+sgd", "adamw", "adamw-f32opt"]
    rows = []
    t0 = time.time()
    for variant in variants:
        row = {"variant": variant}
        for storage in ("float32", "bfloat16"):
            step, carry, _ = build_step(variant, storage, args.batch)
            ms = time_variant(step, carry, args.k, args.reps)
            row[storage] = ms
            print(f"{variant:>14} {storage:>9}: {ms:7.2f} ms/step",
                  file=sys.stderr, flush=True)
        row["bf16_over_f32"] = row["bfloat16"] / row["float32"]
        rows.append(row)

    payload = {
        "platform": platform, "batch": args.batch, "k": args.k,
        "elapsed_s": time.time() - t0, "rows": rows,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "# bf16-storage slowdown bisect — computed results",
        "",
        f"- platform: **{platform}**, batch {args.batch}, {args.k} chained "
        f"steps per timing with one forcing fetch (CLAUDE.md discipline), "
        f"{payload['elapsed_s']:.0f}s total. Stage definitions in "
        "`experiments/bf16_diag.py`.",
        "",
        "| stage | f32 storage ms | bf16 storage ms | bf16/f32 |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['variant']} | {r['float32']:.2f} | {r['bfloat16']:.2f} "
            f"| {r['bf16_over_f32']:.2f}x |"
        )
    lines += [
        "",
        "Reading: the first stage whose bf16/f32 ratio jumps well above 1.0 "
        "carries the mechanism. `adamw` vs `adamw-f32opt` isolates bf16 "
        "optimizer arithmetic from the backward's param handling.",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out + ".md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
