"""shard_map data-parallel training step.

SURVEY.md section 2.14/5.8 prescribes the TPU-native replacement for the
reference's (absent) distributed layer: batch sharded over a 1-D data axis,
per-shard grads reduced with collectives that XLA lowers onto ICI. This
module is that explicit SPMD formulation — ``shard_map`` over the mesh with
in-kernel ``psum``/``pmean`` — complementing train.make_train_step's
jit+NamedSharding path (which additionally supports the vocab-TP layout;
GSPMD infers its collectives).

Reduction semantics: the loss styles reduce differently
(losses._MEAN_STYLE reduces seq-sum-then-batch-mean, the others global-sum
/ BATCH_SIZE — CLIP-DDPM.py:77-92,434-440). With equal shards, mean-style
losses combine with pmean and sum-style with psum so the distributed loss
(and its gradients) exactly equals the single-device computation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from diffusion_image_captioning_tpu import losses, schedules
from diffusion_image_captioning_tpu.config import Config
from diffusion_image_captioning_tpu.parallel.mesh import DATA_AXIS
from diffusion_image_captioning_tpu.train import (
    TrainState,
    compute_losses,
    merge_params,
)


def make_shard_map_train_step(
    model,
    cfg: Config,
    tx: optax.GradientTransformation,
    mesh,
    abar: Optional[jnp.ndarray] = None,
):
    """step(state, batch, key, lam) -> (state, metrics), data-parallel.

    state replicated; every batch array sharded on its leading axis over
    the data mesh axis. The PRNG key is folded with the shard index so each
    shard draws independent noise/timesteps (the single-device run and the
    sharded run are different-but-equivalent random draws; reductions make
    loss/grad match the single-device *semantics*).
    """
    abar = schedules.alpha_cumprod_table(cfg) if abar is None else abar
    mean_style = cfg.loss_func in losses._MEAN_STYLE
    reduce = jax.lax.pmean if mean_style else jax.lax.psum

    def local_step(state: TrainState, batch: dict, key: jax.Array, lam):
        # Same contract as train.make_train_step: fold with the on-device
        # step counter so a driver may pass ONE constant key for the whole
        # run (without this, every optimizer step would reuse identical
        # timestep/noise/dropout draws), then with the shard index so each
        # shard draws independently.
        key = jax.random.fold_in(key, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            m = compute_losses(
                model, cfg, abar, params, batch, key, lam, deterministic=False
            )
            return m["total"], m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        grads = reduce(grads, DATA_AXIS)
        metrics = reduce(metrics, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(
            step=state.step + 1, trainable=trainable, opt_state=opt_state
        )
        return new_state, metrics

    batch_spec = P(DATA_AXIS)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
