"""Parallelism tests on the virtual 8-device CPU mesh: mesh construction,
sharding layout, and the full multi-chip training-step dry run."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffusion_image_captioning_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    return ds


class TestMesh:
    def test_make_mesh_shapes(self, devices):
        m = mesh_lib.make_mesh(devices=devices[:8])
        assert dict(m.shape) == {"data": 8, "model": 1}
        m2 = mesh_lib.make_mesh(model=2, devices=devices[:8])
        assert dict(m2.shape) == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            mesh_lib.make_mesh(data=3, model=2, devices=devices[:8])

    def test_param_shardings_tp_rules(self, devices):
        m = mesh_lib.make_mesh(model=2, devices=devices[:8])
        flat = {
            ("embedding_table",): np.zeros((16, 8), np.float32),
            ("lm_head_kernel",): np.zeros((8, 16), np.float32),
            ("encoder", "layer_0", "q_lin", "kernel"): np.zeros((8, 8), np.float32),
        }
        sh = mesh_lib.param_shardings(flat, m)
        assert sh[("embedding_table",)].spec == P("model", None)
        assert sh[("lm_head_kernel",)].spec == P(None, "model")
        assert sh[("encoder", "layer_0", "q_lin", "kernel")].spec == P()

    def test_tp_off_when_model_axis_1(self, devices):
        m = mesh_lib.make_mesh(devices=devices[:8])
        sh = mesh_lib.param_shardings(
            {("embedding_table",): np.zeros((16, 8), np.float32)}, m
        )
        assert sh[("embedding_table",)].spec == P()

    def test_shard_batch_places_arrays(self, devices):
        m = mesh_lib.make_mesh(devices=devices[:8])
        batch = {"x": np.zeros((16, 4), np.float32), "meta": ["a"] * 16}
        out = mesh_lib.shard_batch(batch, m)
        assert out["x"].sharding.spec == P("data")
        assert out["meta"] == ["a"] * 16


class TestDryRun:
    def test_multichip_train_step(self, devices):
        """The driver-facing dry run: DP x TP mesh, one full train step."""
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
