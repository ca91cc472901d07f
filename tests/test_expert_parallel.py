"""MoE fusion + expert parallelism.

Covers models/fusion.py:MoEFusion and parallel/mesh.py:shard_moe_params on
the 8-virtual-CPU-device mesh: expert-stacked parameter layout, sharded ==
unsharded forward, gradient flow, and the factory entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpu_deer.models.fusion import MoEFusion, create_fusion_module
from tpu_deer.parallel.mesh import shard_moe_params


def _init(rng, num_experts=4, dims=(32, 48, 16), out=64):
    model = MoEFusion(dims, out, num_experts=num_experts, expert_hidden=32)
    mods = [
        jnp.asarray(rng.standard_normal((8, d)), jnp.float32) for d in dims
    ]
    params = model.init(jax.random.PRNGKey(0), mods)["params"]
    return model, params, mods


def test_expert_params_are_stacked(rng):
    _, params, _ = _init(rng, num_experts=4)
    for leaf in jax.tree_util.tree_leaves(params["experts"]):
        assert leaf.shape[0] == 4, "expert axis must lead every expert leaf"


def test_moe_forward_shape_and_gate_mixture(rng):
    model, params, mods = _init(rng)
    out = model.apply({"params": params}, mods)
    assert out.shape == (8, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_expert_sharded_matches_replicated(rng):
    """The expert-parallel layout must be numerically invisible."""
    model, params, mods = _init(rng, num_experts=8)
    ref = np.asarray(model.apply({"params": params}, mods))

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("expert",))
    sharded = shard_moe_params(params, mesh)
    # Every expert leaf sharded, everything else replicated.
    for leaf in jax.tree_util.tree_leaves(sharded["experts"]):
        assert "expert" in (leaf.sharding.spec or ())
    for leaf in jax.tree_util.tree_leaves(sharded["gate"]):
        assert not any(leaf.sharding.spec or ())

    out = jax.jit(lambda p, m: model.apply({"params": p}, m))(sharded, mods)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_moe_gradients_flow_to_all_experts(rng):
    model, params, mods = _init(rng, num_experts=4)
    y = jnp.zeros((8, 64), jnp.float32)

    def loss(p):
        return jnp.mean((model.apply({"params": p}, mods) - y) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g["experts"]):
        per_expert = np.asarray(
            jnp.sum(jnp.abs(leaf.reshape(leaf.shape[0], -1)), axis=-1)
        )
        assert np.all(per_expert > 0), "dense gating must train every expert"


def test_moe_dropout_switch_reaches_experts(rng):
    """Guards the flax-vmap kwarg pitfall: lifted vmap drops keyword args,
    so `deterministic` must travel positionally or expert dropout would be
    silently stuck off."""
    dims = (16, 16)
    model = MoEFusion(dims, 32, num_experts=2, expert_hidden=16, dropout=0.5)
    mods = [jnp.asarray(rng.standard_normal((4, d)), jnp.float32) for d in dims]
    params = model.init(jax.random.PRNGKey(0), mods)["params"]
    det = model.apply({"params": params}, mods, deterministic=True)
    stoch = model.apply(
        {"params": params},
        mods,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(det), np.asarray(stoch)), (
        "deterministic=False must enable expert dropout"
    )


def test_factory_moe_entry(rng):
    model = create_fusion_module("moe", (16, 16, 16), 32, num_experts=2)
    assert isinstance(model, MoEFusion)
    mods = [jnp.ones((4, 16), jnp.float32)] * 3
    params = model.init(jax.random.PRNGKey(0), mods)["params"]
    out = model.apply({"params": params}, mods)
    assert out.shape == (4, 32)
