"""Flash-attention kernel: equality vs einsum reference, masking, padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.ops.flash_attention import flash_attention, reference_attention

INTERPRET = jax.default_backend() != "tpu"


def _qkv(rng, b=2, h=4, tq=256, tk=256, d=32):
    mk = lambda t: jnp.asarray(
        rng.normal(size=(b, h, t, d)).astype(np.float32)
    )
    return mk(tq), mk(tk), mk(tk)


class TestFlashAttention:
    def test_matches_reference(self, rng):
        q, k, v = _qkv(rng)
        ours = flash_attention(q, k, v, interpret=INTERPRET)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_key_mask(self, rng):
        q, k, v = _qkv(rng, tk=256)
        mask = jnp.ones((2, 256)).at[:, 200:].set(0.0)
        ours = flash_attention(q, k, v, kv_mask=mask, interpret=INTERPRET)
        ref = reference_attention(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3
        )
        # Masked keys must have no influence
        k2 = k.at[:, :, 200:].set(99.0)
        v2 = v.at[:, :, 200:].set(-99.0)
        ours2 = flash_attention(q, k2, v2, kv_mask=mask, interpret=INTERPRET)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ours2), atol=1e-4
        )

    def test_non_multiple_lengths_padded(self, rng):
        q, k, v = _qkv(rng, tq=100, tk=77)
        ours = flash_attention(q, k, v, interpret=INTERPRET)
        ref = reference_attention(q, k, v)
        assert ours.shape == (2, 4, 100, 32)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_long_sequence_multiblock(self, rng):
        """T spanning several K blocks exercises the online-softmax carry."""
        q, k, v = _qkv(rng, b=1, h=2, tq=128, tk=512, d=32)
        ours = flash_attention(
            q, k, v, block_q=64, block_k=128, interpret=INTERPRET
        )
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_gradients_flow(self, rng):
        q, k, v = _qkv(rng, b=1, h=2, tq=128, tk=128, d=32)

        def loss(q):
            return jnp.sum(
                flash_attention(q, k, v, interpret=INTERPRET) ** 2
            )

        g = jax.grad(loss)(q)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestMHAFlashPath:
    def test_flash_mha_matches_einsum_mha(self, rng):
        """MultiHeadAttention(use_flash=True) must equal the einsum path on
        the same parameters (dropout off)."""
        import flax.linen  # noqa: F401

        from tpu_deer.models.attention import MultiHeadAttention

        x = jnp.asarray(rng.normal(size=(2, 130, 64)).astype(np.float32))
        mha = MultiHeadAttention(64, num_heads=4, dropout=0.0)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
        out_einsum = mha.apply({"params": params}, x, x, x)
        mha_flash = MultiHeadAttention(64, num_heads=4, dropout=0.0, use_flash=True)
        out_flash = mha_flash.apply({"params": params}, x, x, x)
        np.testing.assert_allclose(
            np.asarray(out_einsum), np.asarray(out_flash), rtol=2e-3, atol=2e-3
        )

    def test_flash_mha_key_mask(self, rng):
        from tpu_deer.models.attention import MultiHeadAttention

        x = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
        mask = jnp.ones((2, 1, 1, 64), dtype=bool).at[:, :, :, 50:].set(False)
        mha = MultiHeadAttention(32, num_heads=4, dropout=0.0)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
        ref = mha.apply({"params": params}, x, x, x, mask=mask)
        flash = MultiHeadAttention(32, num_heads=4, dropout=0.0, use_flash=True)
        got = flash.apply({"params": params}, x, x, x, mask=mask)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=2e-3, atol=2e-3
        )


class TestTextEncoderFlash:
    def test_text_encoder_flash_matches(self, rng):
        from tpu_deer.models.encoders import TextSequenceEncoder

        ids = jnp.asarray(rng.integers(0, 100, size=(2, 40)), dtype=jnp.int32)
        mask = jnp.ones((2, 40), dtype=jnp.int32).at[:, 30:].set(0)
        enc = TextSequenceEncoder(
            vocab_size=100, output_dim=32, model_dim=32, num_layers=1,
            num_heads=4, dropout=0.0,
        )
        params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
        ref, _ = enc.apply({"params": params}, ids, mask)
        enc_flash = TextSequenceEncoder(
            vocab_size=100, output_dim=32, model_dim=32, num_layers=1,
            num_heads=4, dropout=0.0, use_flash=True,
        )
        got, _ = enc_flash.apply({"params": params}, ids, mask)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=5e-3, atol=5e-3
        )


class TestFlashBackwardKernels:
    """Blocked Pallas backward must match the einsum reference's gradients."""

    def _grads(self, fn, q, k, v, mask=None):
        def loss(q, k, v):
            out = fn(q, k, v, mask)
            return jnp.sum(out * jnp.cos(out))  # nontrivial downstream grad

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def test_grads_match_reference(self, rng):
        q, k, v = _qkv(rng, b=1, h=2, tq=128, tk=256, d=32)
        fa = lambda q, k, v, m: flash_attention(q, k, v, m, interpret=INTERPRET)
        dq1, dk1, dv1 = self._grads(fa, q, k, v)
        dq2, dk2, dv2 = self._grads(reference_attention, q, k, v)
        for a, b in ((dq1, dq2), (dk1, dk2), (dv1, dv2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_grads_match_reference_masked(self, rng):
        q, k, v = _qkv(rng, b=2, h=2, tq=64, tk=192, d=32)
        mask = jnp.ones((2, 192)).at[:, 150:].set(0.0)
        fa = lambda q, k, v, m: flash_attention(q, k, v, m, interpret=INTERPRET)
        dq1, dk1, dv1 = self._grads(fa, q, k, v, mask)
        dq2, dk2, dv2 = self._grads(reference_attention, q, k, v, mask)
        for a, b in ((dq1, dq2), (dk1, dk2), (dv1, dv2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )
        # masked keys receive zero gradient
        assert np.abs(np.asarray(dk1)[:, :, 150:]).max() < 1e-6
        assert np.abs(np.asarray(dv1)[:, :, 150:]).max() < 1e-6

    def test_grads_nonmultiple_lengths(self, rng):
        q, k, v = _qkv(rng, b=1, h=2, tq=70, tk=90, d=32)
        fa = lambda q, k, v, m: flash_attention(q, k, v, m, interpret=INTERPRET)
        dq1, dk1, dv1 = self._grads(fa, q, k, v)
        dq2, dk2, dv2 = self._grads(reference_attention, q, k, v)
        for a, b in ((dq1, dq2), (dk1, dk2), (dv1, dv2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )


class TestAutoDispatch:
    """use_flash="auto" (VERDICT r3 task 6): kernel choice follows the
    measured crossovers, and the auto-dispatched module output is identical
    to the fixed choice it resolves to."""

    def test_resolve_thresholds(self):
        from tpu_deer.ops.flash_attention import resolve_use_flash

        assert not resolve_use_flash("auto", 1)
        assert not resolve_use_flash("auto", 1024)  # fwd crossover is 2048
        assert resolve_use_flash("auto", 2048)
        assert resolve_use_flash("auto", 8192)
        # fwd+bwd crossover is lower: flash wins from 1024 when training
        assert resolve_use_flash("auto", 1024, training=True)
        assert not resolve_use_flash("auto", 512, training=True)
        # explicit choices always win
        assert resolve_use_flash(True, 1)
        assert not resolve_use_flash(False, 100000)

    def test_mha_auto_short_t_equals_sdpa(self, rng):
        """Below the crossover the auto module must produce the SDPA path's
        output bit-for-bit (same params, same program)."""
        import jax

        from tpu_deer.models.attention import MultiHeadAttention

        x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
        auto = MultiHeadAttention(32, num_heads=4, use_flash="auto")
        sdpa = MultiHeadAttention(32, num_heads=4, use_flash=False)
        params = auto.init(jax.random.PRNGKey(0), x, x, x)
        out_a = auto.apply(params, x, x, x, deterministic=True)
        out_s = sdpa.apply(params, x, x, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_s))

    def test_mha_auto_long_t_equals_flash(self, rng):
        """At/above the crossover the auto module must match the flash
        module (tiny dims keep interpret mode fast)."""
        import jax

        from tpu_deer.models.attention import MultiHeadAttention
        from tpu_deer.ops.flash_attention import FLASH_AUTO_INFER_T

        t = FLASH_AUTO_INFER_T
        x = jnp.asarray(rng.normal(size=(1, t, 16)).astype(np.float32))
        auto = MultiHeadAttention(16, num_heads=2, use_flash="auto")
        flash = MultiHeadAttention(16, num_heads=2, use_flash=True)
        params = auto.init(jax.random.PRNGKey(0), x[:, :8], x[:, :8], x[:, :8])
        out_a = auto.apply(params, x, x, x, deterministic=True)
        out_f = flash.apply(params, x, x, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_f))
