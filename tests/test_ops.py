"""Fused-op tests: rounding-loss op (fwd/bwd vs dense), the Pallas guard,
and the fused FFN block. (Attention-kernel tests live in
test_attention_core.py — the superseded v1 kernel was retired in round 2.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu.ops.rounding import fused_logprob


class TestFusedLogprob:
    def setup_method(self):
        self.M, self.C, self.V = 12, 16, 300
        self.h = jax.random.normal(jax.random.PRNGKey(0), (self.M, self.C))
        self.W = jax.random.normal(jax.random.PRNGKey(1), (self.C, self.V)) * 0.3
        self.idx = jax.random.randint(jax.random.PRNGKey(2), (self.M,), 0, self.V)

    def _dense(self, h, W):
        z = h @ W
        return (
            jnp.take_along_axis(z, self.idx[:, None], -1)[:, 0]
            - jax.nn.logsumexp(z, axis=-1)
        )

    def test_forward_matches_dense(self):
        got = fused_logprob(self.h, self.W, self.idx, 128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self._dense(self.h, self.W)), atol=1e-5
        )

    def test_forward_vocab_not_tile_multiple(self):
        # V=300 is not a multiple of 128 — padding columns must not leak.
        got = fused_logprob(self.h, self.W, self.idx, 256)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self._dense(self.h, self.W)), atol=1e-5
        )

    def test_gradients_match_dense(self):
        g1 = jax.grad(
            lambda h, W: fused_logprob(h, W, self.idx, 128).sum(), argnums=(0, 1)
        )(self.h, self.W)
        g2 = jax.grad(
            lambda h, W: self._dense(h, W).sum(), argnums=(0, 1)
        )(self.h, self.W)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)

    def test_large_logits_stable(self):
        got = fused_logprob(self.h * 100, self.W * 100, self.idx, 128)
        assert np.all(np.isfinite(np.asarray(got)))


class TestPallasLogprob:
    def _inputs(self):
        M, C, V = 16, 8, 100
        h = jax.random.normal(jax.random.PRNGKey(0), (M, C))
        W = jax.random.normal(jax.random.PRNGKey(1), (C, V)) * 0.3
        idx = jax.random.randint(jax.random.PRNGKey(2), (M,), 0, V)
        return h, W, idx

    def test_interpret_matches_dense(self):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import pallas_logprob

        h, W, idx = self._inputs()
        z = h @ W
        ref = (
            jnp.take_along_axis(z, idx[:, None], -1)[:, 0]
            - jax.nn.logsumexp(z, axis=-1)
        )
        got, lse = pallas_logprob(
            h, W, idx, tile_m=8, tile_v=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(jax.nn.logsumexp(z, axis=-1)), atol=1e-5
        )

    def test_interpret_bwd_matches_autodiff(self):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import (
            pallas_logprob_bwd,
        )

        h, W, idx = self._inputs()

        def dense(h, W):
            z = h @ W
            return (
                jnp.take_along_axis(z, idx[:, None], -1)[:, 0]
                - jax.nn.logsumexp(z, axis=-1)
            )

        lse = jax.nn.logsumexp(h @ W, axis=-1)
        g = jax.random.normal(jax.random.PRNGKey(3), (h.shape[0],))
        dh, dW = pallas_logprob_bwd(
            h, W, idx, lse, g, tile_m=8, tile_v=64, interpret=True
        )
        ref_dh, ref_dW = jax.grad(
            lambda h, W: (dense(h, W) * g).sum(), argnums=(0, 1)
        )(h, W)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(ref_dh), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dW), np.asarray(ref_dW), atol=1e-4)


class TestFusedLogprobSaveZ:
    """Save-z rounding variant: identical values/grads to the recompute
    path (ops/rounding.py::fused_logprob_savez)."""

    def setup_method(self):
        self.M, self.C, self.V = 12, 16, 300
        self.h = jax.random.normal(jax.random.PRNGKey(0), (self.M, self.C))
        self.W = jax.random.normal(jax.random.PRNGKey(1), (self.C, self.V)) * 0.3
        self.idx = jax.random.randint(jax.random.PRNGKey(2), (self.M,), 0, self.V)

    def _dense(self, h, W):
        z = h @ W
        return (
            jnp.take_along_axis(z, self.idx[:, None], -1)[:, 0]
            - jax.nn.logsumexp(z, axis=-1)
        )

    def test_forward_matches_dense(self):
        from diffusion_image_captioning_tpu.ops.rounding import fused_logprob_savez

        got = fused_logprob_savez(self.h, self.W, self.idx, 128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self._dense(self.h, self.W)), atol=1e-5
        )

    def test_gradients_match_dense(self):
        from diffusion_image_captioning_tpu.ops.rounding import fused_logprob_savez

        g1 = jax.grad(
            lambda h, W: fused_logprob_savez(h, W, self.idx, 128).sum(),
            argnums=(0, 1),
        )(self.h, self.W)
        g2 = jax.grad(
            lambda h, W: self._dense(h, W).sum(), argnums=(0, 1)
        )(self.h, self.W)
        # z is stored bf16 in this variant -> looser tolerance than the
        # recompute path (the bwd's softmax is computed from rounded logits)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-2)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-2)

    def test_pallas_interpret_matches_dense(self):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import (
            pallas_dh_from_z,
            pallas_logprob_savez,
        )

        logp, lse, z = pallas_logprob_savez(
            self.h, self.W, self.idx, tile_m=8, tile_v=64, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(logp), np.asarray(self._dense(self.h, self.W)), atol=1e-5
        )
        g = jax.random.normal(jax.random.PRNGKey(3), (self.M,))
        dh = pallas_dh_from_z(
            z, self.W, self.idx, lse, g, m_true=self.M, tile_m=8, tile_v=64,
            interpret=True,
        )
        ref_dh = jax.grad(
            lambda h: (self._dense(h, self.W) * g).sum()
        )(self.h)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(ref_dh), atol=2e-2)


class TestPallasGuard:
    """ops/pallas_guard.py: env override + off-TPU short-circuit."""

    def test_env_forced(self, monkeypatch):
        from diffusion_image_captioning_tpu.ops import pallas_guard as pg

        monkeypatch.setattr(pg, "_cached", None)
        monkeypatch.setenv("DIC_ATTENTION_BACKEND", "xla")
        assert pg.attention_kernel_ok() is False
        monkeypatch.setenv("DIC_ATTENTION_BACKEND", "pallas")
        assert pg.attention_kernel_ok() is True

    def test_off_tpu_true_and_memoized(self, monkeypatch):
        from diffusion_image_captioning_tpu.ops import pallas_guard as pg

        monkeypatch.delenv("DIC_ATTENTION_BACKEND", raising=False)
        monkeypatch.setattr(pg, "_cached", None)
        # CPU backend (conftest forces it): no subprocess probe, trivially OK
        assert pg.attention_kernel_ok() is True
        assert pg._cached is True

    def test_rounding_guard_env_and_downgrade(self, monkeypatch):
        """The fused rounding kernels are guard-probed like attention
        (they are default-on Mosaic programs); a failed probe downgrades
        use_fused_rounding_loss to the dense fallback."""
        from diffusion_image_captioning_tpu.ops import pallas_guard as pg
        from tests.tiny import TINY

        monkeypatch.setattr(pg, "_cached_rounding", None)
        monkeypatch.setenv("DIC_ROUNDING_BACKEND", "xla")
        assert pg.rounding_kernel_ok() is False
        cfg = pg.guard_config(TINY.replace(use_fused_rounding_loss=True))
        assert cfg.use_fused_rounding_loss is False
        monkeypatch.setenv("DIC_ROUNDING_BACKEND", "pallas")
        assert pg.rounding_kernel_ok() is True
        monkeypatch.delenv("DIC_ROUNDING_BACKEND")
        monkeypatch.setattr(pg, "_cached_rounding", None)
        # off-TPU: trivially OK, memoized
        assert pg.rounding_kernel_ok() is True
        cfg2 = pg.guard_config(TINY.replace(use_fused_rounding_loss=True))
        assert cfg2.use_fused_rounding_loss is True


class TestGuardMarkers:
    """On-disk probe memoization (pallas_guard._marker_*): a successful
    probe writes a marker keyed by the ops-source hash, and later runs
    skip the child-process dial entirely (each dial is a tunnel-wedge
    opportunity — CLAUDE.md). Any ops/*.py edit changes the hash."""

    def _fake_tpu(self, monkeypatch):
        import jax

        class _D:
            platform = "tpu"

        monkeypatch.setattr(jax, "devices", lambda *a, **k: [_D()])

    def test_marker_short_circuits_probe(self, monkeypatch, tmp_path):
        from diffusion_image_captioning_tpu.ops import pallas_guard as pg

        monkeypatch.setattr(pg, "_repo_root", lambda: str(tmp_path))
        monkeypatch.setattr(pg, "_cached_rounding", None)
        monkeypatch.delenv("DIC_ROUNDING_BACKEND", raising=False)
        self._fake_tpu(monkeypatch)

        def _boom(*a, **k):
            raise AssertionError("probe child must not launch")

        monkeypatch.setattr(pg.subprocess, "run", _boom)
        mark = pg._marker_path("rounding", (8, 16, "bfloat16"))
        pg._marker_write(mark)
        assert pg.rounding_kernel_ok(
            dim=8, vocab_size=16, matmul_dtype="bfloat16"
        ) is True

    def test_failed_probe_writes_no_marker(self, monkeypatch, tmp_path):
        import subprocess as sp

        from diffusion_image_captioning_tpu.ops import pallas_guard as pg

        monkeypatch.setattr(pg, "_repo_root", lambda: str(tmp_path))
        monkeypatch.setattr(pg, "_cached_rounding", None)
        monkeypatch.delenv("DIC_ROUNDING_BACKEND", raising=False)
        self._fake_tpu(monkeypatch)
        fail = sp.CompletedProcess(args=[], returncode=1, stdout="", stderr="x")
        monkeypatch.setattr(pg.subprocess, "run", lambda *a, **k: fail)
        mark = pg._marker_path("rounding", (8, 16, "bfloat16"))
        assert pg.rounding_kernel_ok(
            dim=8, vocab_size=16, matmul_dtype="bfloat16", verbose=False
        ) is False
        assert not pg._marker_ok(mark)

    def test_ops_hash_busts_marker_path(self, monkeypatch):
        from diffusion_image_captioning_tpu.ops import pallas_guard as pg

        p1 = pg._marker_path("t", (1,))
        monkeypatch.setattr(pg, "_ops_tree_hash", lambda: "deadbeef00000000")
        p2 = pg._marker_path("t", (1,))
        assert p1 != p2


class TestFfnBlock:
    """ops/ffn_block.py: fused FFN+LN vs the XLA oracle (interpret mode)."""

    def _inputs(self, M=24, D=16, H4=32):
        ks = jax.random.split(jax.random.PRNGKey(7), 8)
        x = jax.random.normal(ks[0], (M, D))
        w1 = jax.random.normal(ks[1], (D, H4)) * 0.2
        b1 = jax.random.normal(ks[2], (H4,)) * 0.1
        w2 = jax.random.normal(ks[3], (H4, D)) * 0.2
        b2 = jax.random.normal(ks[4], (D,)) * 0.1
        gamma = 1.0 + 0.1 * jax.random.normal(ks[5], (D,))
        beta = 0.1 * jax.random.normal(ks[6], (D,))
        return x, w1, b1, w2, b2, gamma, beta

    def test_interpret_matches_xla(self):
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        args = self._inputs()
        ref = ffn_ln_block(*args, force_xla=True)
        got = ffn_ln_block(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_rows_not_tile_divisible(self):
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        args = self._inputs(M=13)
        ref = ffn_ln_block(*args, force_xla=True)
        got = ffn_ln_block(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_grads_match_xla_autodiff(self):
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        args = self._inputs()

        def loss(impl, *a):
            out = ffn_ln_block(*a, **impl)
            return (out.astype(jnp.float32) ** 2).sum()

        g_p = jax.grad(lambda *a: loss({"interpret": True}, *a), argnums=tuple(range(7)))(*args)
        g_x = jax.grad(lambda *a: loss({"force_xla": True}, *a), argnums=tuple(range(7)))(*args)
        for gp, gx, name in zip(
            g_p, g_x, ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]
        ):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=2e-4, err_msg=name
            )

    def test_dropout_zeroes_and_scales(self):
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        args = self._inputs()
        rng = jax.random.PRNGKey(3)
        out = ffn_ln_block(
            *args, dropout_rate=0.5, dropout_rng=rng, force_xla=True
        )
        # with a fixed rng the masked output must be deterministic
        out2 = ffn_ln_block(
            *args, dropout_rate=0.5, dropout_rng=rng, force_xla=True
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_requires_rng(self):
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        args = self._inputs()
        with pytest.raises(ValueError):
            ffn_ln_block(*args, dropout_rate=0.1, force_xla=True)

    @pytest.mark.skipif(
        not __import__(
            "diffusion_image_captioning_tpu.ops.ffn_block", fromlist=["on_tpu"]
        ).on_tpu(),
        reason="in-kernel TPU PRNG has no CPU interpret lowering",
    )
    def test_tpu_dropout_stream_matches_mask_kernel(self):
        """The fused forward's in-kernel dropout must equal applying the
        standalone mask kernel's mask in the XLA composition — this is the
        exact property the XLA backward relies on (same (seed, 64-row
        block) PRNG stream)."""
        from diffusion_image_captioning_tpu.ops import ffn_block as fb

        args = self._inputs(M=128, D=8, H4=16)
        x = args[0].astype(jnp.bfloat16)
        seed = jnp.array([1234], jnp.int32)
        out, z, g = fb._pallas_fwd(
            x, *args[1:], seed, rate=0.3, eps=1e-12, interpret=False
        )
        mask = fb._pallas_dropout_mask(
            (128, 8), seed, rate=0.3, interpret=False
        )
        # reconstruct: z = x + mask * (lin2(gelu(lin1(x))))
        h = fb._dot(x, args[1].astype(x.dtype), fb.DIMS_AB) + args[2]
        gg = fb._gelu_f32(h, fb._erf_approx).astype(x.dtype)
        y = fb._dot(gg, args[3].astype(x.dtype), fb.DIMS_AB) + args[4]
        z_ref = x.astype(jnp.float32) + y * mask
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=1e-2
        )
