"""Checkpoint round-trip tests (Orbax) + val-split artifacts."""

import os

import jax
import numpy as np
import pytest

from diffusion_image_captioning_tpu import checkpoint as ck
from diffusion_image_captioning_tpu import train as tr
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY


@pytest.fixture(scope="module")
def state():
    _, params = init_denoiser(TINY, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(TINY)
    return tr.init_train_state(TINY, params, tx)


class TestCheckpoint:
    def test_roundtrip(self, state, tmp_path):
        path = ck.save(state, TINY, "run1", str(tmp_path), val_indices=np.arange(5))
        assert path.endswith("run1.ckpt")
        restored, cfg, val_idx = ck.restore("run1", str(tmp_path), template=state)
        assert cfg == TINY
        np.testing.assert_array_equal(val_idx, np.arange(5))
        for k in state.trainable:
            np.testing.assert_array_equal(
                np.asarray(restored.trainable[k]), np.asarray(state.trainable[k])
            )
        for k in state.frozen:
            np.testing.assert_array_equal(
                np.asarray(restored.frozen[k]), np.asarray(state.frozen[k])
            )
        assert int(restored.step) == int(state.step)

    def test_params_only_resume_resets_optimizer(self, state, tmp_path):
        ck.save(state, TINY, "run2", str(tmp_path))
        tx = tr.make_optimizer(TINY)
        _, params = init_denoiser(TINY, jax.random.PRNGKey(9))
        fresh = tr.init_train_state(TINY, params, tx)
        resumed = ck.restore_params_only("run2", str(tmp_path), fresh)
        # weights come from the checkpoint...
        k = ("image_linear", "kernel")
        np.testing.assert_array_equal(
            np.asarray(resumed.trainable[k]), np.asarray(state.trainable[k])
        )
        # ...but step/opt state are fresh (CLIP-DDPM.py:505-508 semantics)
        assert int(resumed.step) == 0

    def test_long_run_name(self, state, tmp_path):
        """Codec run names can exceed the 255-byte filename limit once orbax
        appends its tmp suffix — the ckpt dir must truncate+hash."""
        name = "epoch10_" + "x" * 240
        path = ck.save(state, TINY, name, str(tmp_path))
        assert len(os.path.basename(path)) <= 185
        restored, _, _ = ck.restore(name, str(tmp_path), template=state)
        assert int(restored.step) == int(state.step)

    def test_val_indices_artifact(self, tmp_path):
        idx = np.asarray([4, 8, 15, 16, 23, 42])
        ck.save_val_indices("run3", str(tmp_path), idx)
        np.testing.assert_array_equal(ck.load_val_indices("run3", str(tmp_path)), idx)

    def test_opt_state_roundtrips(self, state, tmp_path):
        """The module's headline claim — full resume restores optimizer
        state — asserted leaf-for-leaf (an orbax upgrade that zeroed or
        reordered the tuple-keyed adamw mu/nu would otherwise pass)."""
        import jax.numpy as jnp

        # make the moments non-trivial so zeros can't pass
        bumped = jax.tree.map(
            lambda a: a + 1.5 if isinstance(a, jnp.ndarray) and a.dtype.kind == "f" else a,
            state.opt_state,
        )
        st = state.replace(opt_state=bumped)
        ck.save(st, TINY, "run_opt", str(tmp_path))
        restored, _, _ = ck.restore("run_opt", str(tmp_path), template=state)
        got = jax.tree.leaves(restored.opt_state)
        want = jax.tree.leaves(st.opt_state)
        assert len(got) == len(want) and len(got) > 0
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_save_overwrite_keeps_previous_on_disk(self, state, tmp_path):
        """save() must never delete the previous checkpoint before the new
        one is durable: the swap goes through .new/.old renames and ends
        with exactly the final dir present."""
        p1 = ck.save(state, TINY, "run_swap", str(tmp_path))
        st2 = state.replace(step=state.step + 1)
        p2 = ck.save(st2, TINY, "run_swap", str(tmp_path))
        assert p1 == p2
        assert os.path.isdir(p2)
        assert not os.path.exists(p2 + ".new")
        assert not os.path.exists(p2 + ".old")
        restored, _, _ = ck.restore("run_swap", str(tmp_path), template=state)
        assert int(restored.step) == int(st2.step)

    def test_interrupted_swap_recovers(self, state, tmp_path):
        """Crash window between rename(path -> .old) and rename(.new ->
        path): restore() heals from whichever complete dir remains."""
        path = ck.save(state, TINY, "run_crash", str(tmp_path))
        os.rename(path, path + ".old")  # simulate mid-swap kill
        restored, _, _ = ck.restore("run_crash", str(tmp_path), template=state)
        assert int(restored.step) == int(state.step)
        assert os.path.isdir(path)

    def test_crash_during_payload_keeps_old_meta_pairing(self, state, tmp_path):
        """A save() that dies INSIDE the orbax write must not leave the new
        run's meta (config + val split) paired with the previous payload —
        restoring then would evaluate old weights on indices that were its
        training rows (silently inflated BLEU)."""
        ck.save(state, TINY, "run_pair", str(tmp_path), val_indices=np.arange(5))

        class Boom(RuntimeError):
            pass

        import orbax.checkpoint as ocp

        orig = ocp.StandardCheckpointer.save
        try:
            ocp.StandardCheckpointer.save = lambda *a, **k: (_ for _ in ()).throw(Boom())
            with pytest.raises(Boom):
                ck.save(
                    state.replace(step=state.step + 1), TINY, "run_pair",
                    str(tmp_path), val_indices=np.arange(5, 10),
                )
        finally:
            ocp.StandardCheckpointer.save = orig
        restored, _, val_idx = ck.restore("run_pair", str(tmp_path), template=state)
        assert int(restored.step) == int(state.step)  # old payload...
        np.testing.assert_array_equal(val_idx, np.arange(5))  # ...old meta

    def test_crash_between_final_renames_recovers_matching_meta(
        self, state, tmp_path
    ):
        """Kill window between rename(new -> path) and the meta replace:
        the live payload's meta still sits at .new.meta.json — restore()
        (and load_val_indices) must install THAT meta, not fail or fall
        back to the displaced old one."""
        path = ck.save(state, TINY, "run_pair2", str(tmp_path), val_indices=np.arange(3))
        # simulate: new payload already renamed live, meta rename pending
        os.replace(path + ".meta.json", path + ".old.meta.json")
        with open(path + ".new.meta.json", "w") as f:
            import json

            json.dump({"config": {}, "val_indices": [7, 8, 9]}, f)
        np.testing.assert_array_equal(
            ck.load_val_indices("run_pair2", str(tmp_path)), [7, 8, 9]
        )
        assert os.path.exists(path + ".meta.json")
        assert not os.path.exists(path + ".new.meta.json")

    def test_backend_portable_leaves(self, state, tmp_path):
        """save() must write HOST-resident (numpy) leaves: device arrays
        record their sharding in orbax metadata and a template-less
        restore on a DIFFERENT backend then fails ("Device TFRT_CPU_0 was
        not found in jax.local_devices()" — hit for real serving a
        CPU-trained checkpoint on TPU). The reference's torch.save(
        model.cpu(), ...) (CLIP-DDPM.py:551) has the same contract."""
        ck.save(state, TINY, "run_portable", str(tmp_path))
        restored, cfg, _ = ck.restore("run_portable", str(tmp_path))
        leaves = jax.tree_util.tree_leaves(
            (restored.trainable, restored.frozen, restored.opt_state)
        )
        assert leaves, "empty restored state"
        for leaf in leaves:
            assert not isinstance(leaf, jax.Array), (
                "template-less restore returned a device array — the "
                "checkpoint carries sharding metadata and is not "
                "backend-portable"
            )
        # values survive the host round-trip exactly
        k = next(iter(state.trainable))
        np.testing.assert_array_equal(
            np.asarray(restored.trainable[k]), np.asarray(state.trainable[k])
        )
