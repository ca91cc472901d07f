"""GPipe pipeline parallelism vs sequential stage application.

Covers tpu_deer/parallel/pipeline.py on the 8-virtual-CPU-device mesh:
forward equality with a sequential fold over stages, gradient equality
(backprop replays the ring in reverse), microbatch-count invariance, and a
residual-MLP stage body like the encoder trunks use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpu_deer.parallel.pipeline import pipeline_sharded


def _stage_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("stage",))


def _residual_stage(params, h):
    """x + tanh(x @ w + b) — shape-preserving, like models/layers.py blocks."""
    return h + jnp.tanh(h @ params["w"] + params["b"])


def _stacked_params(rng, s, d):
    return {
        "w": jnp.asarray(rng.standard_normal((s, d, d)) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((s, d)) * 0.1, jnp.float32),
    }


def _sequential(params, x):
    def body(h, p):
        return _residual_stage(p, h), None

    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 8), (8, 8)])
def test_pipeline_matches_sequential(rng, n_stages, n_micro):
    mesh = _stage_mesh(n_stages)
    d, b = 16, 32
    params = _stacked_params(rng, n_stages, d)
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    out = pipeline_sharded(
        mesh, _residual_stage, params, x, num_microbatches=n_micro
    )
    ref = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_gradients_match_sequential(rng):
    mesh = _stage_mesh(4)
    d, b = 8, 16
    params = _stacked_params(rng, 4, d)
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    def loss_pipe(params, x):
        out = pipeline_sharded(
            mesh, _residual_stage, params, x, num_microbatches=4
        )
        return jnp.mean((out - y) ** 2)

    def loss_seq(params, x):
        return jnp.mean((_sequential(params, x) - y) ** 2)

    gp, gxp = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    gs, gxs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxs), atol=1e-5)
    for key in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(gp[key]), np.asarray(gs[key]), atol=1e-5
        )


def test_pipeline_microbatch_invariance(rng):
    """Result must not depend on the microbatch split (only throughput does)."""
    mesh = _stage_mesh(4)
    d, b = 8, 24
    params = _stacked_params(rng, 4, d)
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    outs = [
        np.asarray(
            pipeline_sharded(
                mesh, _residual_stage, params, x, num_microbatches=m
            )
        )
        for m in (2, 6, 12)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[1], outs[2], atol=1e-5)


def test_pipeline_rejects_ragged_microbatches(rng):
    mesh = _stage_mesh(2)
    params = _stacked_params(rng, 2, 4)
    x = jnp.zeros((10, 4), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_sharded(
            mesh, _residual_stage, params, x, num_microbatches=3
        )
