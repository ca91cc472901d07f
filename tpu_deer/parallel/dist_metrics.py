"""Distributed metric reduction via sufficient statistics.

Global CCC/MAE/ECE under data parallelism never needs a prediction gather:
CCC is a function of (n, Σx, Σy, Σx², Σy², Σxy), MAE of (n, Σ|err|), and the
binned ECE of per-bin (count, Σconf, Σacc) — all additive, so one tiny psum
(or a host-side sum of per-shard stats) recovers the exact global value.
Verified exact against single-device computation in tests/test_parallel.py.
"""

from __future__ import annotations

import jax

from tpu_deer.core.metrics import CCCStats, ccc_sufficient_stats


def psum_tree(tree, axis_name: str):
    """psum every leaf of a pytree over a mesh axis (use inside shard_map)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), tree)


def global_ccc_stats(
    y_true: jax.Array,
    y_pred: jax.Array,
    mask: jax.Array | None = None,
    axis_name: str | None = None,
) -> CCCStats:
    """Per-shard CCC sufficient stats, optionally psum-reduced over `axis_name`.

    Call inside a shard_map/jit-over-mesh region with axis_name set, or
    without axis_name and reduce the returned stats on host by summation.
    """
    stats = ccc_sufficient_stats(y_true, y_pred, mask)
    if axis_name is not None:
        stats = CCCStats(*psum_tree(tuple(stats), axis_name))
    return stats
