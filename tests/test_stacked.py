"""Stacked (batched-GEMM) compute path: equality with the unstacked model.

The stacked layout (models/stacked.py, VERDICT r4 weak #7) is a pure
restructuring — three independent width-256 encoder chains and three
identical evidence heads become batched dot_generals. These tests pin that
the restructuring changes ONLY the layout: with weights re-laid via
`stack_params`, every model output matches the unstacked forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.models.deer_model import (
    DEERModelConfig,
    count_parameters,
    create_complete_deer_model,
)
from tpu_deer.models.stacked import stack_params

CFG = DEERModelConfig(
    audio_dim=12, video_dim=20, text_dim=28, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=2, dropout=0.1,
)
CFG_STACKED = DEERModelConfig(**{
    **{f.name: getattr(CFG, f.name) for f in CFG.__dataclass_fields__.values()},
    "stacked_compute": True,
})


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _inputs(rng, n=5):
    return (
        rng.standard_normal((n, CFG.audio_dim)).astype(np.float32),
        rng.standard_normal((n, CFG.video_dim)).astype(np.float32),
        rng.standard_normal((n, CFG.text_dim)).astype(np.float32),
    )


class TestStackedEquality:
    def test_outputs_match_unstacked(self, rng):
        """Same weights (re-laid), same inputs → same outputs, every key."""
        model, params = create_complete_deer_model(CFG, seed=0)
        smodel, _ = create_complete_deer_model(CFG_STACKED, seed=0)
        sparams = stack_params(params)
        a, v, t = _inputs(rng)
        ref = model.apply({"params": params}, a, v, t, deterministic=True)
        got = smodel.apply({"params": sparams}, a, v, t, deterministic=True)
        for key in ref:
            r, g = ref[key], got[key]
            if key.endswith("_params"):
                for field in ("mu", "nu", "alpha", "beta"):
                    np.testing.assert_allclose(
                        np.asarray(getattr(g, field)),
                        np.asarray(getattr(r, field)),
                        rtol=1e-5, atol=1e-6, err_msg=f"{key}.{field}",
                    )
            else:
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r),
                    rtol=1e-5, atol=1e-6, err_msg=key,
                )

    def test_param_count_identical(self):
        _, params = create_complete_deer_model(CFG, seed=0)
        _, sparams = create_complete_deer_model(CFG_STACKED, seed=0)
        assert count_parameters(params) == count_parameters(sparams)

    def test_stack_params_covers_whole_tree(self):
        """stack_params output has the stacked model's exact tree structure
        (a missing/renamed leaf would silently zero a module)."""
        _, params = create_complete_deer_model(CFG, seed=0)
        _, sparams = create_complete_deer_model(CFG_STACKED, seed=0)
        relaid = stack_params(params)
        ref_paths = {
            jax.tree_util.keystr(p): leaf.shape
            for p, leaf in jax.tree_util.tree_flatten_with_path(sparams)[0]
        }
        got_paths = {
            jax.tree_util.keystr(p): np.asarray(leaf).shape
            for p, leaf in jax.tree_util.tree_flatten_with_path(relaid)[0]
        }
        assert ref_paths == got_paths

    def test_dropout_fires_in_training_mode(self, rng):
        """Pin the nn.vmap kwargs trap: `deterministic` must reach the
        vmapped submodules positionally (flax drops kwargs under vmap with
        only a RuntimeWarning) — training mode must differ from eval."""
        smodel, sparams = create_complete_deer_model(CFG_STACKED, seed=1)
        a, v, t = _inputs(rng, 6)
        eval_out = smodel.apply(
            {"params": sparams}, a, v, t, deterministic=True
        )
        train_out = smodel.apply(
            {"params": sparams}, a, v, t, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert not np.allclose(
            np.asarray(eval_out["mu_all"]), np.asarray(train_out["mu_all"])
        )

    def test_gradients_flow_and_training_step_runs(self, rng):
        """The stacked path must train: finite loss + nonzero grads through
        both stacked modules."""
        from tpu_deer.core import losses as loss_lib

        smodel, sparams = create_complete_deer_model(CFG_STACKED, seed=1)
        a, v, t = _inputs(rng, 8)
        y = rng.standard_normal((8, 3)).astype(np.float32)

        def loss_fn(p):
            out = smodel.apply(
                {"params": p}, a, v, t, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            ps = [out[f"{n}_params"] for n in smodel.config.dim_names]
            return loss_lib.multi_task_deer_loss(
                ps, jnp.asarray(y), loss_lib.DEERLossConfig()
            )["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(sparams)
        assert np.isfinite(float(loss))
        enc_g = jax.tree_util.tree_leaves(grads["stacked_encoders"])
        head_g = jax.tree_util.tree_leaves(grads["stacked_heads"])
        assert any(float(jnp.abs(g).max()) > 0 for g in enc_g)
        assert any(float(jnp.abs(g).max()) > 0 for g in head_g)
