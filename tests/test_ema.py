"""EMA of the trainable params (Config.ema_decay — TPU extension, no
reference counterpart; motivated by the v2 BLEU-swing investigation,
docs/PERF.md round 5): the device-side update law, checkpoint round-trips
across every (saved, wanted) EMA combination, and the end-of-run additive
eval line."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import checkpoint as ck
from diffusion_image_captioning_tpu import train as tr
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY

EMA_CFG = TINY.replace(ema_decay=0.9)


@pytest.fixture(scope="module")
def setup():
    model, params = init_denoiser(EMA_CFG, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(EMA_CFG)
    return model, params, tx


def _state(params, tx, cfg=EMA_CFG):
    # Copied leaves: train_step donates its input state (tests/test_train.py
    # fresh_state rationale).
    return tr.init_train_state(cfg, jax.tree.map(jnp.array, params), tx)


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


class TestUpdateLaw:
    def test_seeded_at_init_params(self, setup):
        _, params, tx = setup
        state = _state(params, tx)
        for k, v in state.trainable.items():
            np.testing.assert_array_equal(np.asarray(state.ema[k]), np.asarray(v))
            # never aliased: the train step donates every state buffer
            assert state.ema[k] is not state.trainable[k]

    def test_disabled_keeps_none(self, setup):
        _, params, tx = setup
        state = _state(params, tx, cfg=TINY)
        assert state.ema is None
        step = tr.make_train_step(
            init_denoiser(TINY, jax.random.PRNGKey(0))[0], TINY, tx
        )
        state2, _ = step(state, _batch(), jax.random.PRNGKey(1), jnp.float32(0.3))
        assert state2.ema is None

    def test_one_step_recurrence(self, setup):
        model, params, tx = setup
        state = _state(params, tx)
        p0 = {k: np.asarray(v).copy() for k, v in state.trainable.items()}
        step = tr.make_train_step(model, EMA_CFG, tx)
        state1, _ = step(state, _batch(), jax.random.PRNGKey(1), jnp.float32(0.3))
        d = EMA_CFG.ema_decay
        for k in p0:
            want = p0[k] * d + np.asarray(state1.trainable[k]) * (1.0 - d)
            np.testing.assert_allclose(
                np.asarray(state1.ema[k]), want, rtol=1e-6, atol=1e-7
            )

    def test_two_steps_track_both_updates(self, setup):
        model, params, tx = setup
        state = _state(params, tx)
        p0 = {k: np.asarray(v).copy() for k, v in state.trainable.items()}
        step = tr.make_train_step(model, EMA_CFG, tx)
        s1, _ = step(state, _batch(seed=1), jax.random.PRNGKey(1), jnp.float32(0.3))
        p1 = {k: np.asarray(v).copy() for k, v in s1.trainable.items()}
        s2, _ = step(s1, _batch(seed=2), jax.random.PRNGKey(1), jnp.float32(0.3))
        d = EMA_CFG.ema_decay
        k = next(iter(p0))
        want = (p0[k] * d + p1[k] * (1 - d)) * d + np.asarray(
            s2.trainable[k]
        ) * (1 - d)
        np.testing.assert_allclose(np.asarray(s2.ema[k]), want, rtol=1e-6, atol=1e-7)


class TestCheckpoint:
    def _save(self, state, cfg, tmp_path):
        from diffusion_image_captioning_tpu.config import model_name

        name = model_name(cfg)
        ck.save(state, cfg, name, str(tmp_path))
        return name

    def test_roundtrip_with_ema(self, setup, tmp_path):
        model, params, tx = setup
        state = _state(params, tx)
        step = tr.make_train_step(model, EMA_CFG, tx)
        state, _ = step(state, _batch(), jax.random.PRNGKey(1), jnp.float32(0.3))
        name = self._save(state, EMA_CFG, tmp_path)
        got, _, _ = ck.restore(
            name, str(tmp_path), template=_state(params, tx)
        )
        assert got.ema is not None
        for k in state.ema:
            np.testing.assert_array_equal(
                np.asarray(got.ema[k]), np.asarray(state.ema[k])
            )

    def test_pre_ema_checkpoint_seeds_from_params(self, setup, tmp_path):
        # A checkpoint written with ema_decay=0 resumed by an EMA run:
        # the average re-seeds at the restored params, copied not aliased.
        _, params, tx = setup
        plain = _state(params, tx, cfg=TINY)
        name = self._save(plain, TINY, tmp_path)
        got, _, _ = ck.restore(name, str(tmp_path), template=_state(params, tx))
        assert got.ema is not None
        for k in got.ema:
            a, b = np.asarray(got.ema[k]), np.asarray(got.trainable[k])
            np.testing.assert_array_equal(a, b)
            assert not np.shares_memory(a, b)

    def test_ema_checkpoint_resumed_without_ema_drops_it(self, setup, tmp_path):
        _, params, tx = setup
        state = _state(params, tx)
        name = self._save(state, EMA_CFG, tmp_path)
        got, _, _ = ck.restore(
            name, str(tmp_path), template=_state(params, tx, cfg=TINY)
        )
        assert got.ema is None

    def test_params_only_resume_carries_ema(self, setup, tmp_path):
        _, params, tx = setup
        state = _state(params, tx)
        name = self._save(state, EMA_CFG, tmp_path)
        got = ck.restore_params_only(name, str(tmp_path), _state(params, tx))
        assert got.ema is not None


class TestJitInitFlag:
    def test_state_bit_identical_to_eager(self, setup, monkeypatch):
        """DIC_JIT_INIT's opt/EMA init leg must be BIT-identical and
        structure-identical to the eager path (zeros + exact copies — no
        RNG), or checkpoint templates and the donating train step would
        see a different tree across the flag."""
        _, params, tx = setup
        eager = tr.init_train_state(
            EMA_CFG, jax.tree.map(jnp.array, params), tx
        )
        monkeypatch.setenv("DIC_JIT_INIT", "1")
        jitted = tr.init_train_state(
            EMA_CFG, jax.tree.map(jnp.array, params), tx
        )
        assert jax.tree.structure(eager.opt_state) == jax.tree.structure(
            jitted.opt_state
        )
        for a, b in zip(
            jax.tree.leaves(eager.opt_state), jax.tree.leaves(jitted.opt_state)
        ):
            assert jnp.asarray(a).dtype == jnp.asarray(b).dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert jitted.ema is not None
        for k in eager.ema:
            np.testing.assert_array_equal(
                np.asarray(eager.ema[k]), np.asarray(jitted.ema[k])
            )
            # still a copy, never an alias of the trainable buffer
            assert not np.shares_memory(
                np.asarray(jitted.ema[k]), np.asarray(jitted.trainable[k])
            )


class TestHasEmaProbe:
    """_ckpt_has_ema probe ordering (VERDICT round-4 weak #3): the PUBLIC
    orbax metadata API is primary; the raw '"ema"' substring match on the
    private _METADATA manifest is only the fallback. A future orbax that
    keeps the manifest file but re-encodes its keys must not silently
    report "no EMA" (that re-seeds EMA from raw params, discarding the
    saved average)."""

    def _saved_ema_ckpt(self, setup, tmp_path):
        from diffusion_image_captioning_tpu.config import model_name

        _, params, tx = setup
        state = _state(params, tx)
        name = model_name(EMA_CFG)
        ck.save(state, EMA_CFG, name, str(tmp_path))
        return ck._ckpt_dir(str(tmp_path), name)

    def test_real_checkpoints_both_ways(self, setup, tmp_path):
        path = self._saved_ema_ckpt(setup, tmp_path)
        assert ck._ckpt_has_ema(path) is True
        _, params, tx = setup
        from diffusion_image_captioning_tpu.config import model_name

        plain = _state(params, tx, cfg=TINY)
        pname = model_name(TINY)
        ck.save(plain, TINY, pname, str(tmp_path))
        assert ck._ckpt_has_ema(ck._ckpt_dir(str(tmp_path), pname)) is False

    def test_key_renamed_manifest_api_wins(self, setup, tmp_path, monkeypatch):
        # Fake the future-orbax scenario: _METADATA survives but its key
        # encoding drops the literal '"ema"' bytes, while the public
        # metadata API still answers correctly. The probe must trust the
        # API, not the stale substring.
        import os

        path = self._saved_ema_ckpt(setup, tmp_path)
        manifest = os.path.join(path, "_METADATA")
        with open(manifest, encoding="utf-8") as f:
            text = f.read()
        assert '"ema"' in text
        with open(manifest, "w", encoding="utf-8") as f:
            f.write(text.replace('"ema"', '"\\u0065ma"'))

        class _FakeMeta:
            item_metadata = {"step": 0, "trainable": {}, "ema": {}}

        monkeypatch.setattr(
            ck.ocp.StandardCheckpointer,
            "metadata",
            lambda self, p: _FakeMeta(),
        )
        assert ck._ckpt_has_ema(path) is True

    def test_api_failure_falls_back_to_manifest(self, setup, tmp_path, monkeypatch):
        path = self._saved_ema_ckpt(setup, tmp_path)

        def _boom(self, p):
            raise RuntimeError("metadata API unavailable")

        monkeypatch.setattr(ck.ocp.StandardCheckpointer, "metadata", _boom)
        assert ck._ckpt_has_ema(path) is True
