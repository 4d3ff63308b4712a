"""Unit tests for config codec, noise/LR schedules, q-sampling, and losses.

Expected values are hand-derived from the formulas documented in SURVEY.md
sections 2.8-2.10 (independent numpy recomputation — no reference code)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import config as cfg_lib
from diffusion_image_captioning_tpu import diffusion, losses, schedules
from diffusion_image_captioning_tpu.config import Config, model_name

# The exact run name of the published best model — the filename of the log at
# the reference repo root. The codec must reproduce it byte-for-byte.
BEST_RUN_NAME = (
    "epoch15_lossseries_sum_sample_mean_lr1E-04-5E-05_schedulerlinspace"
    "_round3E-01_dynamic-1_clipconcat_class_weight0E+00_class_prob2E-01"
    "_train-embedFalse_samplesize100_x_0_predictTrue_X_INTERVAL100"
    "_use_x_tTrue_use_x_1True_use_probTrue"
)


class TestConfig:
    def test_model_name_codec_matches_reference_log_filename(self):
        assert model_name(cfg_lib.BLESSED) == BEST_RUN_NAME

    def test_model_name_codec_default(self):
        name = model_name(Config())
        assert name.startswith("epoch5_lossseries_sum_sample_mean_lr1E-04-5E-05")
        assert "_round5E-01_" in name

    def test_derived_fields(self):
        c = Config()
        assert c.in_channel == 768
        assert c.fused_length == 18
        assert c.effective_batch == 800
        assert c.replace(train_embedding=True).in_channel == 16
        assert c.replace(clip_adding_method="add").fused_length == 16

    def test_json_roundtrip(self):
        c = cfg_lib.BLESSED
        assert Config.from_json(c.to_json()) == c

    def test_validation(self):
        with pytest.raises(ValueError):
            Config(loss_func="nope")
        with pytest.raises(ValueError):
            Config(scheduler="nope")
        with pytest.raises(ValueError):
            Config(clip_adding_method="nope")


class TestNoiseSchedule:
    def test_cosine_matches_formula(self):
        c = Config()
        abar = np.asarray(schedules.alpha_cumprod_table(c))
        assert abar.shape == (1000,)
        s = 0.008
        for t in (0, 1, 500, 999):
            expect = (
                math.cos(math.pi / 2 * (t / 1000 + s) / (1 + s)) ** 2
                / math.cos(math.pi / 2 * s / (1 + s)) ** 2
            )
            assert abs(abar[t] - expect) < 1e-6
        assert abar[0] == pytest.approx(1.0)
        assert np.all(np.diff(abar) < 0)

    def test_linear_beta(self):
        c = Config(cosin_schedule=False, step_tot=2000)
        abar = np.asarray(schedules.alpha_cumprod_table(c))
        assert abar.shape == (2000,)
        # betas = [0, linspace(1e-4, 0.02, 2000)]; abar = cumprod(1-betas[:-1])
        assert abar[0] == pytest.approx(1.0)
        assert abar[1] == pytest.approx(1.0 - 1e-4)
        betas = np.concatenate([[0.0], np.linspace(1e-4, 0.02, 2000)])
        assert abar[-1] == pytest.approx(np.prod(1 - betas[:-1]), rel=1e-4)

    def test_posterior_tables_consistency(self):
        c = Config()
        tabs = schedules.posterior_tables(c)
        abar = np.asarray(schedules.alpha_cumprod_table(c), dtype=np.float64)
        alphas = np.asarray(tabs["alphas"], dtype=np.float64)
        # cumprod of per-step alphas must rebuild abar
        assert np.allclose(np.cumprod(alphas), abar, rtol=1e-4)
        # posterior mean coefficients sum appropriately at large t
        assert np.all(np.asarray(tabs["posterior_variance"])[1:] >= 0)


class TestLRSchedules:
    def test_linspace(self):
        lrs = schedules.learning_rates(Config(epoch_num=15))
        assert len(lrs) == 15
        assert lrs[0] == pytest.approx(1e-4)
        assert lrs[-1] == pytest.approx(5e-5)

    def test_logspace(self):
        lrs = schedules.learning_rates(Config(scheduler="logspace", epoch_num=5))
        assert lrs[0] == pytest.approx(1e-4)
        assert lrs[-1] == pytest.approx(5e-5)
        # geometric spacing
        ratios = lrs[1:] / lrs[:-1]
        assert np.allclose(ratios, ratios[0])

    def test_cosine_annealing_is_15_long_3x_repeated(self):
        lrs = schedules.learning_rates(Config(scheduler="cosine_annealing"))
        assert len(lrs) == 15
        assert np.allclose(lrs[:5], lrs[5:10])
        assert lrs[0] == pytest.approx(1e-4)
        # half-cosine from LR toward END over 5 points: last point is
        # END + (LR-END)*(1+cos(4/5 pi))/2
        expect_last = 5e-5 + (1e-4 - 5e-5) * (1 + math.cos(4 / 5 * math.pi)) / 2
        assert lrs[4] == pytest.approx(expect_last)


class TestQSample:
    def setup_method(self):
        self.cfg = Config()
        self.abar = schedules.alpha_cumprod_table(self.cfg)
        self.key = jax.random.PRNGKey(0)
        self.x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 8))

    def test_shape_and_order(self):
        t = jnp.array([0, 500, 999])
        xt = diffusion.q_sample(self.abar, self.x0, t, self.key)
        assert xt.shape == (12, 16, 8)
        # t=0 has abar=1 (cosine) -> x_t == x0 exactly
        np.testing.assert_allclose(np.asarray(xt[:4]), np.asarray(self.x0), rtol=1e-6)

    def test_shared_noise_quirk(self):
        # With shared noise, the implied epsilon is identical across timesteps.
        t = jnp.array([100, 800])
        xt = diffusion.q_sample(self.abar, self.x0, t, self.key, shared_noise=True)
        a = np.asarray(self.abar)[np.asarray(t)]
        eps0 = (np.asarray(xt[:4]) - math.sqrt(a[0]) * np.asarray(self.x0)) / math.sqrt(1 - a[0])
        eps1 = (np.asarray(xt[4:]) - math.sqrt(a[1]) * np.asarray(self.x0)) / math.sqrt(1 - a[1])
        np.testing.assert_allclose(eps0, eps1, atol=1e-4)

    def test_fresh_noise(self):
        t = jnp.array([100, 800])
        xt = diffusion.q_sample(self.abar, self.x0, t, self.key, shared_noise=False)
        a = np.asarray(self.abar)[np.asarray(t)]
        eps0 = (np.asarray(xt[:4]) - math.sqrt(a[0]) * np.asarray(self.x0)) / math.sqrt(1 - a[0])
        eps1 = (np.asarray(xt[4:]) - math.sqrt(a[1]) * np.asarray(self.x0)) / math.sqrt(1 - a[1])
        assert np.abs(eps0 - eps1).max() > 0.1

    def test_statistics(self):
        # At large t the output should be ~ N(0, 1).
        x0 = jnp.ones((64, 16, 64))
        t = jnp.array([999])
        xt = diffusion.q_sample(self.abar, x0, t, self.key)
        assert abs(float(xt.mean())) < 0.02
        assert abs(float(xt.std()) - 1.0) < 0.02

    def test_diffuse_pair_modes(self):
        t = jnp.array([500, 700])
        xt, tgt = diffusion.diffuse_pair(self.abar, self.x0, t, self.key)
        assert tgt is self.x0
        xt2, tgt2 = diffusion.diffuse_pair(
            self.abar, self.x0, t, self.key, x_0_prediction=False, t_interval=100
        )
        assert tgt2.shape == (8, 16, 8)
        # target at t-100 must be less noisy than input at t
        assert float(jnp.abs(tgt2).mean()) < float(jnp.abs(xt2).mean()) + 1.0


class TestDistances:
    def setup_method(self):
        self.cfg = Config(batch_size=8, sample_size=100)
        k = jax.random.PRNGKey(2)
        self.a = jax.random.normal(k, (6, 16, 768))
        self.b = jax.random.normal(jax.random.PRNGKey(3), (6, 16, 768))

    def test_series_sum_sample_mean(self):
        got = float(losses.series_sum_sample_mean(self.a, self.b, self.cfg))
        d = np.abs(np.asarray(self.a) - np.asarray(self.b))
        assert got == pytest.approx(d.sum(axis=1).mean(), rel=1e-5)

    def test_series_sum(self):
        got = float(losses.series_sum(self.a, self.b, self.cfg))
        d = np.abs(np.asarray(self.a) - np.asarray(self.b))
        assert got == pytest.approx(d.sum() / 8 / 768 / 100, rel=1e-5)

    def test_mse_series_mean(self):
        got = float(losses.mse_series_mean(self.a, self.b, self.cfg))
        d = (np.asarray(self.a) - np.asarray(self.b)) ** 2
        assert got == pytest.approx(np.sqrt(d.sum(axis=(-2, -1))).mean(), rel=1e-5)

    def test_mse_series_sum(self):
        got = float(losses.mse_series_sum(self.a, self.b, self.cfg))
        d = (np.asarray(self.a) - np.asarray(self.b)) ** 2
        assert got == pytest.approx(np.sqrt(d.sum(axis=(-2, -1))).sum() / 8, rel=1e-5)

    def test_mse_mean(self):
        got = float(losses.mse_mean(self.a, self.b, self.cfg))
        d = (np.asarray(self.a) - np.asarray(self.b)) ** 2
        assert got == pytest.approx(d.mean(), rel=1e-5)


class TestRoundingLoss:
    def setup_method(self):
        k = jax.random.PRNGKey(4)
        self.logits = jax.random.normal(k, (5, 16, 50)) * 3.0
        self.idx = jax.random.randint(jax.random.PRNGKey(5), (5, 16), 0, 50)

    def _ref_logp(self):
        x = np.asarray(self.logits, dtype=np.float64)
        p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
        return np.log(np.take_along_axis(p, np.asarray(self.idx)[..., None], -1))[..., 0]

    def test_stable_equals_naive(self):
        s = losses.gathered_log_prob(self.logits, self.idx, stable=True)
        n = losses.gathered_log_prob(self.logits, self.idx, stable=False)
        np.testing.assert_allclose(np.asarray(s), np.asarray(n), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), self._ref_logp(), atol=1e-4)

    def test_stable_survives_large_logits(self):
        big = self.logits * 200.0
        s = losses.gathered_log_prob(big, self.idx, stable=True)
        assert np.all(np.isfinite(np.asarray(s)))

    def test_mean_style_reduction(self):
        c = Config(batch_size=5, loss_func="series_sum_sample_mean")
        got = float(losses.rounding_loss(self.logits, self.idx, c))
        assert got == pytest.approx(-self._ref_logp().sum(axis=1).mean(), rel=1e-4)

    def test_sum_style_reduction(self):
        c = Config(batch_size=5, loss_func="series_sum")
        got = float(losses.rounding_loss(self.logits, self.idx, c))
        assert got == pytest.approx(-self._ref_logp().sum() / 5, rel=1e-4)

    def test_max_prob_variant(self):
        got = float(losses.max_prob_rounding_loss(self.logits))
        x = np.asarray(self.logits, dtype=np.float64)
        p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
        assert got == pytest.approx(-np.log(p.max(-1)).mean(), rel=1e-4)


class TestCfgMask:
    def test_no_guidance(self):
        m = losses.cfg_concat_mask(jax.random.PRNGKey(0), 16, Config())
        assert m.shape == (16, 2)
        np.testing.assert_array_equal(np.asarray(m), np.tile([1.0, 0.0], (16, 1)))

    def test_guided_rows_pinned(self):
        c = Config(classifier_free_weight=0.3, classifier_free_prob=0.2)
        m = losses.cfg_concat_mask(jax.random.PRNGKey(0), 800, c)
        m = np.asarray(m)
        assert np.all(m[:, 0] == 1.0)
        assert m[0, 1] == 0.0 and m[1, 1] == 1.0
        frac = m[:, 1].mean()
        assert 0.7 < frac < 0.9  # keep prob 0.8


class TestPosteriorPairIdentity:
    def test_strided_pair_reduces_to_single_step(self):
        """The ancestral sampler's per-pair coefficients (built from abar
        ratios) must equal posterior_tables' single-step identities for
        consecutive (t, t-1) — the regression behind the strided-sampling
        fix in sample.ancestral_sample."""
        from diffusion_image_captioning_tpu import schedules
        from diffusion_image_captioning_tpu.config import Config

        cfg = Config()
        tabs = schedules.posterior_tables(cfg)
        abar = np.asarray(tabs["alpha_cumprod"], np.float64)
        for t in (1, 7, 250, 999):
            s = t - 1
            alpha_ts = abar[t] / abar[s]
            denom = 1.0 - abar[t]
            c0 = np.sqrt(abar[s]) * (1 - alpha_ts) / denom
            ct = np.sqrt(alpha_ts) * (1 - abar[s]) / denom
            var = (1 - abar[s]) / denom * (1 - alpha_ts)
            np.testing.assert_allclose(
                c0, float(tabs["posterior_mean_coef_x0"][t]), rtol=2e-4
            )
            np.testing.assert_allclose(
                ct, float(tabs["posterior_mean_coef_xt"][t]), rtol=2e-4
            )
            np.testing.assert_allclose(
                var, float(tabs["posterior_variance"][t]), rtol=2e-4, atol=1e-12
            )

    def test_cosine_annealing_covers_long_runs(self):
        from diffusion_image_captioning_tpu import schedules
        from diffusion_image_captioning_tpu.config import Config

        cfg = Config(scheduler="cosine_annealing", epoch_num=32,
                     learning_rate=1e-4, end_learning_rate=5e-5)
        lrs = schedules.learning_rates(cfg)
        assert len(lrs) >= 32
        # first 15 entries unchanged vs the reference's fixed-length array
        ref15 = schedules.learning_rates(cfg.replace(epoch_num=15))[:15]
        np.testing.assert_allclose(lrs[:15], ref15)
