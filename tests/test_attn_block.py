"""Fused attention half-block tests: Pallas (interpret) vs the XLA oracle,
gradients for every parameter, dropout determinism, and consistency with
the unfused module composition (ops/attn_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu.ops import attn_block as ab


def make_inputs(N=4, L=6, H=2, dh=8, seed=0):
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (N * L, D))
    wqkv = jax.random.normal(ks[1], (D, 3 * D)) * 0.2
    bqkv = jax.random.normal(ks[2], (3 * D,)) * 0.1
    wout = jax.random.normal(ks[3], (D, D)) * 0.2
    bout = jax.random.normal(ks[4], (D,)) * 0.1
    gamma = 1.0 + 0.1 * jax.random.normal(ks[5], (D,))
    beta = 0.1 * jax.random.normal(ks[6], (D,))
    mask = jnp.ones((N, L)).at[:, -2:].set(0.0)
    return (x, wqkv, bqkv, wout, bout, gamma, beta, mask), H, L


def call(args, H, L, **kw):
    x, wqkv, bqkv, wout, bout, gamma, beta, mask = args
    return ab.attn_ln_block(
        x, wqkv, bqkv, wout, bout, gamma, beta, mask,
        n_heads=H, seq_len=L, **kw,
    )


class TestForward:
    def test_interpret_matches_xla(self):
        args, H, L = make_inputs()
        ref = call(args, H, L, force_xla=True)
        got = call(args, H, L, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_sequence_count_not_tile_divisible(self):
        args, H, L = make_inputs(N=5)
        ref = call(args, H, L, force_xla=True)
        got = call(args, H, L, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_xla_matches_unfused_module_composition(self):
        """The oracle itself must equal the unfused path's math:
        Dense(qkv) -> attention_core(XLA) -> Dense(out) -> residual -> LN."""
        from diffusion_image_captioning_tpu.ops.attention_core import (
            attention_core,
        )

        args, H, L = make_inputs()
        x, wqkv, bqkv, wout, bout, gamma, beta, mask = args
        qkv = x @ wqkv + bqkv
        ctx = attention_core(qkv, mask, n_heads=H, seq_len=L, force_xla=True)
        y = ctx @ wout + bout
        z = x + y
        mean = z.mean(-1, keepdims=True)
        var = ((z - mean) ** 2).mean(-1, keepdims=True)
        ref = (z - mean) * jax.lax.rsqrt(var + 1e-12) * gamma + beta
        got = call(args, H, L, force_xla=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )


class TestBackward:
    def test_grads_match_xla_autodiff(self):
        args, H, L = make_inputs()

        def loss(impl, *a):
            out = call(a + (args[-1],), H, L, **impl)
            return (out.astype(jnp.float32) ** 2).sum()

        diff_args = args[:-1]
        g_p = jax.grad(
            lambda *a: loss({"interpret": True}, *a), argnums=tuple(range(7))
        )(*diff_args)
        g_x = jax.grad(
            lambda *a: loss({"force_xla": True}, *a), argnums=tuple(range(7))
        )(*diff_args)
        names = ["x", "wqkv", "bqkv", "wout", "bout", "gamma", "beta"]
        for gp, gx, name in zip(g_p, g_x, names):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=2e-4, err_msg=name
            )

    def test_grads_with_padding(self):
        args, H, L = make_inputs(N=5)

        def loss(impl, x):
            out = call((x,) + args[1:], H, L, **impl)
            return (out.astype(jnp.float32) ** 2).sum()

        gp = jax.grad(lambda x: loss({"interpret": True}, x))(args[0])
        gx = jax.grad(lambda x: loss({"force_xla": True}, x))(args[0])
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=2e-4
        )


class TestDropout:
    def test_xla_dropout_deterministic_per_key(self):
        args, H, L = make_inputs()
        rng = jax.random.PRNGKey(7)
        out1 = call(args, H, L, dropout_rate=0.5, dropout_rng=rng, force_xla=True)
        out2 = call(args, H, L, dropout_rate=0.5, dropout_rng=rng, force_xla=True)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        out3 = call(
            args, H, L, dropout_rate=0.5,
            dropout_rng=jax.random.PRNGKey(8), force_xla=True,
        )
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6

    def test_requires_rng(self):
        args, H, L = make_inputs()
        with pytest.raises(ValueError):
            call(args, H, L, dropout_rate=0.1, force_xla=True)


class TestModuleIntegration:
    def test_param_tree_identical_to_unfused(self):
        """use_fused_attn_block must not change the parameter layout
        (checkpoints + HF converter depend on it)."""
        from diffusion_image_captioning_tpu.models.distilbert import (
            DenoiserEncoder,
        )

        kw = dict(
            dim=16, n_layers=1, n_heads=2, hidden_dim=32, dropout=0.0,
            attention_dropout=0.0, dtype=jnp.float32,
        )
        x = jnp.zeros((2, 4, 16))
        mask = jnp.ones((2, 4))
        p_fused = DenoiserEncoder(use_fused_attn_block=True, **kw).init(
            jax.random.PRNGKey(0), x, mask
        )["params"]
        p_plain = DenoiserEncoder(use_fused_attn_block=False, **kw).init(
            jax.random.PRNGKey(0), x, mask
        )["params"]
        flat_f = jax.tree_util.tree_flatten_with_path(p_fused)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(p_plain)[0]
        paths_f = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_f]
        paths_p = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_p]
        assert paths_f == paths_p

    def test_encoder_outputs_match_unfused(self):
        from diffusion_image_captioning_tpu.models.distilbert import (
            DenoiserEncoder,
        )

        kw = dict(
            dim=16, n_layers=2, n_heads=2, hidden_dim=32, dropout=0.0,
            attention_dropout=0.0, dtype=jnp.float32,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
        mask = jnp.ones((2, 4))
        enc_f = DenoiserEncoder(use_fused_attn_block=True, **kw)
        enc_p = DenoiserEncoder(use_fused_attn_block=False, **kw)
        params = enc_p.init(jax.random.PRNGKey(0), x, mask)["params"]
        out_f = enc_f.apply({"params": params}, x, mask)
        out_p = enc_p.apply({"params": params}, x, mask)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), atol=1e-5
        )
