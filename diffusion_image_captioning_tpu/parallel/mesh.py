"""Device mesh and sharding layout.

The reference is strictly single-GPU (CLIP-DDPM.py:20-25; no distributed
imports anywhere — SURVEY.md section 2.14). This module is the new
capability: a 2-D ``Mesh(('data', 'model'))`` over the TPU slice with

  * batch axis sharded over ``data`` (pure DP — the 800-row effective batch
    splits evenly over 8 chips, 100 rows each);
  * the two vocab-sized matrices — the 30522x768 embedding table and the
    768x30522 vocab head — sharded over ``model`` (vocab-dim tensor
    parallelism). These dominate parameter bytes and the rounding-loss
    FLOPs; everything else is replicated (66M-param encoder on 16 tokens
    does not benefit from further TP).

Collectives (grad psum over ``data``, logsumexp reduction over ``model``)
are inserted by XLA from these NamedShardings and ride ICI within a slice —
there is no user-level communication backend to configure.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Param-name -> PartitionSpec for the tensor-parallel leaves. Leaf names are
# the flattened path suffixes in the denoiser param tree (models/denoiser.py).
_TP_RULES = {
    "embedding_table": P(MODEL_AXIS, None),   # [V, C] vocab-sharded
    "lm_head_kernel": P(None, MODEL_AXIS),    # [C, V] vocab-sharded
}


def init_distributed() -> bool:
    """Multi-host initialization (SURVEY.md section 2.14): call once per
    process before device use on a multi-host slice. No-op (returns False)
    when the standard coordinator env vars are absent — single-host runs,
    tests, and this single-chip environment skip it transparently."""
    import os
    import sys

    wants_init = bool(
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        # Cloud TPU multi-host slices don't set a coordinator address — JAX
        # auto-detects it from TPU metadata with the no-arg initialize().
        # Those environments are recognizable by worker-topology env vars.
        or os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not wants_init:
        return False
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True  # already initialized (idempotent call)
    except Exception:
        pass
    try:
        jax.distributed.initialize()
        return True
    except RuntimeError as e:
        # Tolerate ONLY the already-up cases (a second initialize, or a
        # library call after first device use on a single-host image that
        # exports topology vars): warn and proceed single-host. Any OTHER
        # failure on a multi-host slice (unreachable coordinator, timeout)
        # must abort — proceeding would let every host train an
        # independent copy and overwrite the same run artifacts.
        msg = str(e).lower()
        if "already" in msg or "before" in msg:
            print(f"init_distributed skipped: {e}", file=sys.stderr)
            return False
        raise


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over all (or given) devices; data axis size defaults to
    n_devices // model."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis; feature axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _path_components(path) -> list[str]:
    """Flatten a keypath into string components. Handles nested dict keys,
    flat tuple-keyed dicts (train.partition_params), and attribute keys
    (TrainState / optax state fields), so one sharding function covers the
    whole training state including Adam moments."""
    out: list[str] = []
    for k in path:
        key = getattr(k, "key", getattr(k, "name", None))
        if isinstance(key, tuple):
            out.extend(str(x) for x in key)
        elif key is not None:
            out.append(str(key))
    return out


def param_shardings(tree, mesh: Mesh):
    """NamedSharding tree: vocab-dim TP for the two big tables (only when
    the model axis is real), everything else replicated. Works on a param
    tree, a flat partition dict, or a whole TrainState (Adam moments keyed
    by the same param paths get the matching TP layout)."""
    tp_on = mesh.shape[MODEL_AXIS] > 1

    def shard(path, leaf):
        if tp_on:
            for name in _path_components(path):
                if name in _TP_RULES:
                    return NamedSharding(mesh, _TP_RULES[name])
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the batch axis sharded over data.
    (Delegates to the single transfer loop in data/prefetch.py.)"""
    from diffusion_image_captioning_tpu.data.prefetch import device_put_batch

    return device_put_batch(batch, batch_sharding(mesh))


def memory_stats() -> dict:
    """Per-device memory snapshot — the mem_report() equivalent
    (CLIP-DDPM.py:31-38). Returns {} on backends without stats (CPU)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return out
