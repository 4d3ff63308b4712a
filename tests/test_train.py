"""Trainer tests: partition, optimizer, loss computation, epoch driver."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import schedules
from diffusion_image_captioning_tpu import train as tr
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY


@pytest.fixture(scope="module")
def setup():
    model, params = init_denoiser(TINY, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(TINY)
    state = tr.init_train_state(TINY, params, tx)
    return model, params, tx, state


def fresh_state(params, tx):
    """A TrainState over COPIED leaves: train_step donates its input state,
    so tests must never feed the shared module-scoped fixture buffers into
    a donating step (donation is real on TPU, a warning-only no-op on CPU)."""
    copied = jax.tree.map(jnp.array, params)
    return tr.init_train_state(TINY, copied, tx)


def _batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(0, TINY.vocab_size, (B, TINY.max_length)).astype(
            np.int32
        ),
        "attention_mask": np.ones((B, TINY.max_length), np.int32),
        "image_clip": rng.normal(size=(B, TINY.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(B, TINY.clip_dim)).astype(np.float32),
    }


class TestPartition:
    def test_roundtrip(self, setup):
        _, params, _, _ = setup
        trainable, frozen = tr.partition_params(params, TINY)
        merged = tr.merge_params(trainable, frozen)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(merged)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_content(self, setup):
        _, params, _, _ = setup
        trainable, frozen = tr.partition_params(params, TINY)
        assert set(frozen) == {("embedding_table",), ("lm_head_kernel",)}
        assert ("embedding_table",) not in trainable


class TestComputeLosses:
    def test_terms_finite_and_flagged(self, setup):
        model, params, _, _ = setup
        abar = schedules.alpha_cumprod_table(TINY)
        m = tr.compute_losses(
            model, TINY, abar, params, _batch(), jax.random.PRNGKey(0),
            jnp.asarray(0.5), deterministic=True,
        )
        for name in ("x_t_loss", "x_1_loss", "prob_loss", "total"):
            assert np.isfinite(float(m[name])), name
        assert float(m["total"]) == pytest.approx(
            float(m["x_t_loss"]) + float(m["x_1_loss"]) + float(m["prob_loss"]),
            rel=1e-5,
        )

    def test_use_flags_zero_terms(self, setup):
        model, params, _, _ = setup
        cfg = TINY.replace(use_x_t_loss=False, use_prob_loss=False)
        abar = schedules.alpha_cumprod_table(cfg)
        m = tr.compute_losses(
            model, cfg, abar, params, _batch(), jax.random.PRNGKey(0),
            jnp.asarray(0.5), deterministic=True,
        )
        assert float(m["x_t_loss"]) == 0.0
        assert float(m["prob_loss"]) == 0.0
        assert float(m["x_1_loss"]) > 0.0

    def test_lambda_scales_prob(self, setup):
        model, params, _, _ = setup
        abar = schedules.alpha_cumprod_table(TINY)
        m1 = tr.compute_losses(
            model, TINY, abar, params, _batch(), jax.random.PRNGKey(0),
            jnp.asarray(0.5), deterministic=True,
        )
        m2 = tr.compute_losses(
            model, TINY, abar, params, _batch(), jax.random.PRNGKey(0),
            jnp.asarray(1.0), deterministic=True,
        )
        assert float(m2["prob_loss"]) == pytest.approx(
            2 * float(m1["prob_loss"]), rel=1e-5
        )


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, params, tx, _ = setup
        state = fresh_state(params, tx)
        step = tr.make_train_step(model, TINY, tx)
        batch = _batch()
        lam = jnp.asarray(0.5)
        first = None
        for i in range(12):
            state, m = step(state, batch, jax.random.PRNGKey(42), lam)
            if first is None:
                first = float(m["total"])
        assert float(m["total"]) < first

    def test_frozen_params_unchanged(self, setup):
        model, params, tx, _ = setup
        state = fresh_state(params, tx)
        emb0 = np.asarray(state.frozen[("embedding_table",)]).copy()
        step = tr.make_train_step(model, TINY, tx)
        state, _ = step(state, _batch(), jax.random.PRNGKey(0), jnp.asarray(0.5))
        np.testing.assert_array_equal(
            np.asarray(state.frozen[("embedding_table",)]), emb0
        )

    def test_set_learning_rate(self, setup):
        model, params, tx, _ = setup
        state = fresh_state(params, tx)
        state = tr.set_learning_rate(state, 3e-4)
        assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(3e-4)


class TestFit:
    def test_epoch_driver_logs_and_history(self, setup):
        model, params, tx, _ = setup
        state = fresh_state(params, tx)
        batches = [_batch(seed=s) for s in range(3)]
        buf = io.StringIO()
        saved = []
        state, hist = tr.fit(
            model, TINY, state, batches, batches[:1],
            summary=buf,
            checkpoint_fn=lambda s, tag: saved.append(tag),
        )
        assert len(hist) == TINY.epoch_num
        lines = [l for l in buf.getvalue().splitlines() if l.startswith("epoch ")]
        assert len(lines) == TINY.epoch_num
        # reference line format: 6 floats after the colon (CLIP-DDPM.py:554)
        from diffusion_image_captioning_tpu.logging_utils import extract_floats

        vals = extract_floats(lines[0].split(":")[1])
        assert len(vals) == 6
        assert saved in ([ "final"], ["early_stop"])  # exactly one checkpoint

    def test_remat_denoiser(self, setup):
        """jax.checkpoint over encoder blocks (remat_denoiser flag) must
        train identically-shaped and finite."""
        model_cfg = TINY.replace(remat_denoiser=True)
        model, params = init_denoiser(model_cfg, jax.random.PRNGKey(0))
        tx = tr.make_optimizer(model_cfg)
        state = tr.init_train_state(model_cfg, params, tx)
        step = tr.make_train_step(model, model_cfg, tx)
        state, m = step(state, _batch(), jax.random.PRNGKey(0), jnp.asarray(0.5))
        assert np.isfinite(float(m["total"]))

    def test_dynamic_rounding_weight(self, setup):
        """Dynamic lambda (CLIP-DDPM.py:535-536): lambda tracks the device-
        accumulated loss ratio; the fit loop must stay finite and the
        prob term must respond to the changing weight."""
        model, params, _, _ = setup
        cfg = TINY.replace(dynamic_rounding_weight=0.5, epoch_num=2)
        tx = tr.make_optimizer(cfg)
        state = tr.init_train_state(cfg, jax.tree.map(jnp.array, params), tx)
        batches = [_batch(seed=s) for s in range(2)]
        state, hist = tr.fit(model, cfg, state, batches, batches[:1])
        assert all(np.isfinite(h["train_prob"]) for h in hist)
        assert hist[-1]["train_prob"] > 0

    def test_debug_mode_single_batch(self, setup):
        model, params, tx, _ = setup
        state = fresh_state(params, tx)
        calls = []
        state, hist = tr.fit(
            model, TINY, state, [_batch()], [_batch()],
            debug=True, progress_fn=lambda e, s, m: calls.append((e, s)),
        )
        assert len(hist) == 1
        assert calls == [(0, 1)]

    def test_drain_cadence_pokes_and_preserves_math(self, setup, monkeypatch):
        """DIC_DRAIN_EVERY_STEPS=K blocks on device progress every K train
        steps and pokes the watchdog at each drain (the async-dispatch
        watchdog false-positive fix: dispatch pokes alone stop minutes
        before the device finishes a long epoch — see _fit_epochs). The
        drain is observability-only: the training history must be bitwise
        identical with it on or off."""
        from diffusion_image_captioning_tpu.utils import profiling

        model, params, tx, _ = setup
        batches = [_batch(seed=s) for s in range(4)]

        pokes = {"n": 0}
        orig_poke = profiling.StallWatchdog.poke

        def counting_poke(self):
            pokes["n"] += 1
            return orig_poke(self)

        monkeypatch.setattr(profiling.StallWatchdog, "poke", counting_poke)

        def run():
            pokes["n"] = 0
            state = fresh_state(params, tx)
            _, hist = tr.fit(model, TINY, state, batches, batches[:1])
            return hist, pokes["n"]

        monkeypatch.delenv("DIC_DRAIN_EVERY_STEPS", raising=False)
        hist_off, pokes_off = run()
        monkeypatch.setenv("DIC_DRAIN_EVERY_STEPS", "2")
        hist_on, pokes_on = run()

        # one extra poke per drain point: floor(4 steps / 2) per epoch
        assert pokes_on == pokes_off + 2 * TINY.epoch_num
        for off, on in zip(hist_off, hist_on):
            assert off == on  # bitwise-equal loss scalars


class TestAdamWTorchParity:
    """The reference's optimizer IS torch.optim.AdamW at defaults
    (CLIP-DDPM.py:335); make_optimizer must reproduce its update math —
    including the reference's per-epoch param_group['lr'] mutation
    (:520-522), which set_learning_rate mirrors via inject_hyperparams."""

    def test_matches_torch_adamw_with_lr_override(self):
        import optax

        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(11)
        p0 = rng.normal(size=(7, 5)).astype(np.float32)
        grads = [
            rng.normal(size=(7, 5)).astype(np.float32) for _ in range(6)
        ]
        cfg = TINY
        tx = tr.make_optimizer(cfg)
        params = {"w": jnp.asarray(p0)}
        opt_state = tx.init(params)
        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.AdamW([tp], lr=cfg.learning_rate)
        # torch defaults == Config defaults (betas, eps, weight_decay 0.01)
        for i, g in enumerate(grads):
            if i == 3:  # mid-run LR override, both sides
                hp = dict(opt_state.hyperparams)
                hp["learning_rate"] = jnp.asarray(
                    cfg.end_learning_rate, jnp.float32
                )
                opt_state = opt_state._replace(hyperparams=hp)
                for grp in topt.param_groups:
                    grp["lr"] = cfg.end_learning_rate
            updates, opt_state = tx.update(
                {"w": jnp.asarray(g)}, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()
        np.testing.assert_allclose(
            np.asarray(params["w"], np.float32),
            tp.detach().numpy(),
            atol=2e-6,
        )
