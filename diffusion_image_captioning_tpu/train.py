"""Training: jitted train/eval steps and the epoch driver.

Reference contract (CLIP-DDPM.py:451-561):
  * per optimizer step: embed ids -> x0; draw S=100 timesteps; q-sample x_t
    [S*B,L,C] and x_1 [B,L,C]; run the denoiser on both; three-term loss;
    AdamW step (train_func, :458-486).
  * per epoch: override LR from the schedule array (:520-522), accumulate the
    three loss terms, validate, early-stop checkpoint that does NOT break the
    loop (:548-557), append a reference-format log line (:554). The optional
    dynamic rounding weight updates after EVERY batch from the running
    epoch-accumulated sums (:535-536 sit inside the batch loop).

TPU-first deviations (math-preserving):
  * the reference runs TWO denoiser forwards per step (batch 800 then batch
    8, CLIP-DDPM.py:415,426). Rows don't interact (no batch norm; CFG mixing
    is per-row), so we fuse them into ONE forward of S*B+B rows — same math,
    one kernel launch, better MXU utilization.
  * boolean-indexed CFG becomes an always-computed second forward blended by
    `where` (SURVEY.md section 7, hard part (e)).
  * gradients exist only for the trainable partition (the reference's custom
    parameters(), CLIP-DDPM.py:258-269, realized as a pytree split).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

# Bench-only experiment toggle — see make_train_step. Read at import so the
# flag is uniform across every step a process traces.
_OPT_BARRIER = bool(os.environ.get("DIC_OPT_BARRIER"))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax import traverse_util

from diffusion_image_captioning_tpu import diffusion, losses, schedules
from diffusion_image_captioning_tpu.config import Config
from diffusion_image_captioning_tpu.models.denoiser import (
    CLIPDiffusionLM,
    param_labels,
)

# ---------------------------------------------------------------------------
# Parameter partition
# ---------------------------------------------------------------------------


def partition_params(params, cfg: Config):
    """Split the param tree into (trainable, frozen) flat dicts keyed by
    path tuples. Frozen = embedding table + vocab head when the embedding is
    frozen (CLIP-DDPM.py:245-247,258-269)."""
    labels = traverse_util.flatten_dict(param_labels(params, cfg))
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if labels[k] == "trainable"}
    frozen = {k: v for k, v in flat.items() if labels[k] == "frozen"}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict):
    return traverse_util.unflatten_dict({**frozen, **trainable})


def device_batch(batch: dict) -> dict:
    """Array-only view of a batch: host-side metadata columns (caption and
    image-name strings riding along for decode/BLEU) must not reach jit."""
    return {k: v for k, v in batch.items() if hasattr(v, "shape")}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Any
    frozen: Any
    opt_state: Any
    # Optional EMA of the trainable partition (Config.ema_decay > 0); None
    # when disabled — None is an empty pytree, so every existing jit/donate/
    # sharding path is unchanged when off.
    ema: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW with torch defaults (CLIP-DDPM.py:335 — lr overridden per epoch,
    weight decay 0.01 applied to every trained leaf, like torch)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.learning_rate,
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )


def init_train_state(cfg: Config, params, tx: optax.GradientTransformation) -> TrainState:
    trainable, frozen = partition_params(params, cfg)
    # DIC_JIT_INIT=1: one compiled program instead of eager per-leaf
    # dispatch — measured 15.3 s for the eager form at combined scale
    # through the tunnel (runs_combined_v3/segment_a2.log init sub
    # splits). Unlike the model-init flag leg (ULP-different RNG bits),
    # this is bit-SAFE: optimizer moments are zeros and EMA is an exact
    # copy; tests pin structural equality of the two paths.
    if os.environ.get("DIC_JIT_INIT"):
        opt_state = jax.jit(tx.init)(trainable)
        ema = (
            jax.jit(lambda t: jax.tree.map(jnp.array, t))(trainable)
            if cfg.ema_decay > 0
            else None
        )
    else:
        opt_state = tx.init(trainable)
        # Seeded as a COPY: aliasing the trainable buffers would hand the
        # donating train step the same buffer twice.
        ema = jax.tree.map(jnp.array, trainable) if cfg.ema_decay > 0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=opt_state,
        ema=ema,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Per-epoch LR override (CLIP-DDPM.py:520-522)."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


# ---------------------------------------------------------------------------
# Loss computation (shared by train and validation)
# ---------------------------------------------------------------------------


def compute_losses(
    model: CLIPDiffusionLM,
    cfg: Config,
    abar: jnp.ndarray,
    params,
    batch: dict,
    key: jax.Array,
    lam: jnp.ndarray,
    *,
    deterministic: bool,
) -> dict:
    """The three loss terms for one batch (CLIP-DDPM.py:382-445 semantics).

    batch: input_ids [B,L] int32, attention_mask [B,L], and (unless fusion is
    "none") image_clip/text_clip [B, clip_dim].
    """
    S, B, L = cfg.sample_size, batch["input_ids"].shape[0], cfg.max_length
    t_key, n_key, n1_key, cfg_key, drop_key = jax.random.split(key, 5)

    ids = batch["input_ids"]
    mask = batch["attention_mask"].astype(jnp.float32)
    x0 = model.apply({"params": params}, ids, method="embed")  # [B,L,C]

    t = jax.random.randint(t_key, (S,), 0, cfg.step_tot)
    x_t, x_tgt = diffusion.diffuse_pair(
        abar, x0, t, n_key,
        x_0_prediction=cfg.x_0_prediction,
        t_interval=cfg.x_t_step_interval,
        shared_noise=cfg.shared_qsample_noise,
    )
    x_1 = diffusion.q_sample(
        abar, x0, jnp.ones((1,), jnp.int32), n1_key,
        shared_noise=cfg.shared_qsample_noise,
    )  # [B,L,C]

    # Fused forward: S*B x_t rows followed by B x_1 rows.
    xin = jnp.concatenate([x_t, x_1], axis=0)
    mask_in = jnp.concatenate([jnp.tile(mask, (S, 1)), mask], axis=0)
    cmask_t = losses.cfg_concat_mask(cfg_key, S * B, cfg)
    cmask_1 = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (B, 1))
    cmask = jnp.concatenate([cmask_t, cmask_1], axis=0)

    if cfg.clip_adding_method != "none":
        img = batch["image_clip"][:, None, :]  # [B,1,512]
        txt = batch["text_clip"][:, None, :]
        img_in = jnp.concatenate([jnp.tile(img, (S, 1, 1)), img], axis=0)
        txt_in = jnp.concatenate([jnp.tile(txt, (S, 1, 1)), txt], axis=0)
    else:
        img_in = txt_in = jnp.zeros((S * B + B, 1, cfg.clip_dim), jnp.float32)

    # Fused rounding path: skip the [N, L, V] logits materialization and
    # compute gathered log-softmax directly from hidden states + vocab head
    # (ops/rounding.py) — the reference's memory peak eliminated
    # (SURVEY.md section 3.1, CLIP-DDPM.py:434-440).
    use_fused = (
        cfg.use_fused_rounding_loss
        and cfg.use_prob_loss
        and not cfg.rounding_max_prob
    )
    if deterministic:
        rngs = {}
    else:
        if cfg.fast_dropout_rng:
            # rbg keys: hardware RNG for the ~100M dropout bits per step.
            drop_key = jax.random.wrap_key_data(
                jax.random.bits(drop_key, (4,), "uint32"), impl="rbg"
            )
        rngs = {"dropout": drop_key}
    out = model.apply(
        {"params": params}, xin, img_in, txt_in, mask_in, cmask,
        deterministic=deterministic, rngs=rngs,
        return_logits=not use_fused,
    )
    hid_t, hid_1 = out.hidden[: S * B], out.hidden[S * B :]
    if not use_fused:
        log_t, log_1 = out.logits[: S * B], out.logits[S * B :]

    dist = losses.distance(cfg.loss_func)
    zero = jnp.zeros((), jnp.float32)

    if cfg.use_x_t_loss:
        tgt = jnp.tile(x0, (S, 1, 1)) if cfg.x_0_prediction else x_tgt
        x_t_loss = dist(hid_t[:, :L], tgt, cfg)
    else:
        x_t_loss = zero
    x_1_loss = dist(hid_1[:, :L], x0, cfg) if cfg.use_x_1_loss else zero

    if cfg.use_prob_loss:
        if cfg.rounding_max_prob:
            # lm-trial variant: -log max softmax over the x_1 branch only
            # (lm-trial/main.py:187).
            prob = losses.max_prob_rounding_loss(log_1)
        elif use_fused:
            from diffusion_image_captioning_tpu.ops.rounding import (
                fused_logprob,
                fused_logprob_savez,
            )

            W = params["lm_head_kernel"]
            ids_all = jnp.concatenate([jnp.tile(ids, (S, 1)), ids], axis=0)
            h_all = out.hidden[:, :L].reshape(-1, out.hidden.shape[-1])
            head_frozen = cfg.freeze_embedding and not cfg.train_embedding
            # save-z only pays in the BACKWARD (reads the stored bf16
            # logits instead of recomputing h @ W); under an eval step
            # there is no backward, and the multi-output pallas_call
            # can't be partially DCE'd — choosing it would write ~800 MB
            # of dead logits per val batch at flagship shape.
            logprob = (
                fused_logprob_savez
                if (cfg.rounding_save_z and head_frozen and not deterministic)
                else fused_logprob
            )
            lp = logprob(
                h_all, W, ids_all.reshape(-1), 1024, "auto", cfg.compute_dtype
            ).reshape(S * B + B, L)
            prob = losses.reduce_rounding(lp[: S * B], cfg) + losses.reduce_rounding(
                lp[S * B :], cfg
            )
        else:
            prob = losses.rounding_loss(
                log_t, jnp.tile(ids, (S, 1)), cfg
            ) + losses.rounding_loss(log_1, ids, cfg)
        prob = lam * prob
    else:
        prob = zero

    total = x_t_loss + x_1_loss + prob
    return {
        "x_t_loss": x_t_loss,
        "x_1_loss": x_1_loss,
        "prob_loss": prob,
        "total": total,
    }


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------


def make_train_step(
    model: CLIPDiffusionLM,
    cfg: Config,
    tx: optax.GradientTransformation,
    abar: Optional[jnp.ndarray] = None,
) -> Callable:
    """Returns jitted step(state, batch, key, lam) -> (state, metrics).

    Donates the state buffers; with sharded inputs (parallel/mesh.py) XLA
    inserts the grad all-reduce over the data axis automatically.
    """
    abar = schedules.alpha_cumprod_table(cfg) if abar is None else abar

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict, key: jax.Array, lam: jnp.ndarray):
        # Key folded with the step counter ON DEVICE: the driver loop can
        # pass one constant key for the whole run (a host-side
        # jax.random.split per step costs a dispatch round-trip each).
        key = jax.random.fold_in(key, state.step)

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            m = compute_losses(
                model, cfg, abar, params, batch, key, lam, deterministic=False
            )
            return m["total"], m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        if _OPT_BARRIER:
            # Experiment toggle (bench/fusion_barrier_sweep.py): materialize
            # grads before the optimizer so XLA cannot fuse the weight-grad
            # matmuls with their AdamW elementwise updates — tests whether
            # those mixed fusions are what holds the dW matmuls at 52-65%
            # MXU (docs/PERF.md per-op audit).
            grads = jax.lax.optimization_barrier(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        ema = state.ema
        if cfg.ema_decay > 0:
            # Pure elementwise HBM traffic; XLA fuses it into the update.
            d = jnp.asarray(cfg.ema_decay, jnp.float32)
            ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), state.ema, trainable
            )
        new_state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
            ema=ema,
        )
        return new_state, metrics

    return step


def make_eval_step(
    model: CLIPDiffusionLM, cfg: Config, abar: Optional[jnp.ndarray] = None
) -> Callable:
    """Jitted validation losses (no grad, no dropout — CLIP-DDPM.py:488-501)."""
    abar = schedules.alpha_cumprod_table(cfg) if abar is None else abar

    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array, lam: jnp.ndarray):
        params = merge_params(state.trainable, state.frozen)
        return compute_losses(
            model, cfg, abar, params, batch, key, lam, deterministic=True
        )

    return step


def make_eval_group_step(
    model: CLIPDiffusionLM, cfg: Config, abar: Optional[jnp.ndarray] = None
) -> Callable:
    """Grouped validation losses: one device call scanning the eval
    computation over G stacked batches (Config.eval_loss_group).

    The scan carries the [3] accumulator and adds each batch's
    (x_t, x_1, prob) in dispatch order, so the result is bit-identical to
    G sequential make_eval_step calls accumulated on device — only the
    host-dispatch count changes (~Gx fewer remote-tunnel round trips on
    the reference's per-epoch val loop, CLIP-DDPM.py:488-501)."""
    abar = schedules.alpha_cumprod_table(cfg) if abar is None else abar

    @jax.jit
    def step(
        state: TrainState,
        batches: dict,   # each leaf stacked to [G, ...]
        keys: jax.Array,  # [G, key]
        lam: jnp.ndarray,
        vacc: jnp.ndarray,  # [3] running (x_t, x_1, prob) sums
    ):
        params = merge_params(state.trainable, state.frozen)

        def body(acc, bk):
            batch, key = bk
            m = compute_losses(
                model, cfg, abar, params, batch, key, lam, deterministic=True
            )
            return (
                acc + jnp.stack([m["x_t_loss"], m["x_1_loss"], m["prob_loss"]]),
                None,
            )

        vacc, _ = jax.lax.scan(body, vacc, (batches, keys))
        return vacc

    return step


@functools.partial(jax.jit, static_argnames=("n",))
def _advance_key_chain(key: jax.Array, n: int) -> jax.Array:
    """Replay n iterations of ``key, _ = jax.random.split(key)`` as one scan."""

    def body(k, _):
        return jax.random.split(k)[0], None

    out, _ = jax.lax.scan(body, key, None, length=n)
    return out


# ---------------------------------------------------------------------------
# Epoch driver
# ---------------------------------------------------------------------------


def fit(
    model: CLIPDiffusionLM,
    cfg: Config,
    state: TrainState,
    train_batches,   # re-iterable of batch dicts
    val_batches,     # re-iterable of batch dicts
    *,
    seed: int = 0,
    summary=None,            # file-like; reference-format lines appended
    checkpoint_fn=None,      # fn(state, tag) called at early-stop / final
    debug: Optional[bool] = None,
    progress_fn=None,        # fn(epoch, step, metrics) per-step hook
    tx=None,                 # optax transform; MUST be the one state's
                             # opt_state was init'd with (default rebuilds
                             # make_optimizer(cfg), which matches
                             # init_train_state's default usage)
    mesh=None,               # jax.sharding.Mesh: multi-chip training. The
                             # caller must have placed `state` with
                             # parallel.mesh.param_shardings; batches are
                             # sharded over the data axis here and GSPMD
                             # inserts the grad all-reduce (over ICI on a
                             # real slice). SURVEY section 2.14.
):
    """The epoch loop (CLIP-DDPM.py:515-561), host-side.

    Returns (state, history) where history is a list of per-epoch dicts with
    the six averaged loss scalars, matching the log line order.
    """
    import contextlib
    import os

    from diffusion_image_captioning_tpu.data.prefetch import PrefetchingLoader
    from diffusion_image_captioning_tpu.utils.profiling import (
        StallWatchdog,
        StepTimer,
    )

    debug = cfg.debug if debug is None else debug
    tx = make_optimizer(cfg) if tx is None else tx
    train_step = make_train_step(model, cfg, tx)
    eval_step = make_eval_step(model, cfg)
    # Grouped val-loss dispatch (bit-identical math; see make_eval_group_step).
    # Mesh runs keep the per-dispatch loop: batches are sharded individually.
    eval_group_step = (
        make_eval_group_step(model, cfg)
        if cfg.eval_loss_group > 1 and mesh is None
        else None
    )
    if mesh is not None:
        from diffusion_image_captioning_tpu.parallel import mesh as mesh_lib

        prep = lambda b: mesh_lib.shard_batch(device_batch(b), mesh)  # noqa: E731
        mesh_ctx = lambda: jax.set_mesh(mesh)  # noqa: E731
    else:
        prep = device_batch
        mesh_ctx = contextlib.nullcontext
    lrs = schedules.learning_rates(cfg)
    key = jax.random.PRNGKey(seed)
    base_key = jax.random.fold_in(key, 0x5EED)  # per-step fold happens on device
    if cfg.schedule_offset_epochs and hasattr(val_batches, "__len__"):
        # Schedule-correct segment (config.py): the val-loss loop consumes
        # len(val_batches) key splits per epoch, so a segment starting at
        # global epoch `offset` must fast-forward the chain to where the
        # monolithic run would be. One jitted scan — not offset*n_val
        # dispatches. (The train-step stream needs no replay: its key is
        # folded with state.step on device, and step is restored.)
        key = _advance_key_chain(
            key, cfg.schedule_offset_epochs * len(val_batches)
        )
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    dyn = cfg.dynamic_rounding_weight
    if not isinstance(train_batches, PrefetchingLoader):
        # Prefetch directly INTO the mesh sharding: transferring to device 0
        # first and resharding in prep() would move every batch twice
        # through a single-device funnel. prep()'s device_put is then a
        # no-op for train batches (already placed) and a real transfer
        # only for the unwrapped val batches.
        train_batches = PrefetchingLoader(
            train_batches,
            sharding=None if mesh is None else mesh_lib.batch_sharding(mesh),
        )

    early_stopped = False
    history = []
    timer = StepTimer()  # steps/s over train steps only (pause() at epoch ends)
    # Wedge detector: a blocked device call (remote-tunnel hazard,
    # CLAUDE.md) otherwise stalls the run silently. Steps dispatch
    # asynchronously, so the poke that matters is the one after each
    # BLOCKING point (epoch-end drain, val batches).
    watchdog = StallWatchdog(
        timeout_s=float(os.environ.get("DIC_STALL_TIMEOUT_S", "600"))
    ).start()
    try:
        state, history, early_stopped = _fit_epochs(
            model, cfg, state, train_batches, val_batches, train_step,
            eval_step, prep, mesh_ctx, lrs, key, base_key, lam, dyn, debug,
            summary, checkpoint_fn, progress_fn, timer, watchdog, history,
            eval_group_step=eval_group_step,
        )
    finally:
        watchdog.stop()
    if not early_stopped:
        _checkpoint_guarded(checkpoint_fn, state, "final", summary)
    if summary is not None and timer.steps_per_sec > 0:
        # Additive observability line (not present in reference logs; the
        # epoch-line parser keys on 'epoch ' prefixes so co-plotting is
        # unaffected). SURVEY section 5.1 / VERDICT round-1 item 8.
        summary.write(f"train steps/s: {timer.steps_per_sec:.3f}\n")
        summary.flush()
    return state, history


def _fit_epochs(
    model, cfg, state, train_batches, val_batches, train_step, eval_step,
    prep, mesh_ctx, lrs, key, base_key, lam, dyn, debug, summary,
    checkpoint_fn, progress_fn, timer, watchdog, history,
    eval_group_step=None,
):
    """The epoch loop body of fit() (split out so the watchdog wraps it)."""
    import os
    import sys
    import time as _time

    phase_times = bool(os.environ.get("DIC_PHASE_TIMES"))
    # In-epoch drain cadence. Two jobs: (1) watchdog truthfulness — async
    # dispatch lets the host run the whole epoch's dispatch loop minutes
    # ahead of the device, after which dispatch pokes stop and the 425-s
    # watchdog false-positives on any epoch whose DEVICE time exceeds the
    # timeout (2026-08-19: nine healthy combined-scale runs were shot by
    # their supervisor this way); each drain pokes at device progress
    # instead. (2) Bounded run-ahead — tens of thousands of queued step
    # dispatches sit in host/tunnel buffers otherwise. Off by default
    # (bench measures raw enqueue+drain); wedge_supervisor.sh sets 500/0.5.
    drain_every = int(os.environ.get("DIC_DRAIN_EVERY_STEPS", "0"))
    drain_sleep = float(os.environ.get("DIC_DRAIN_SLEEP_S", "0"))
    early_stopped = False
    _NAMES = ("x_t_loss", "x_1_loss", "prob_loss", "total")
    for epoch in range(cfg.epoch_num):
        if cfg.end_learning_rate != cfg.learning_rate:
            state = set_learning_rate(state, float(lrs[epoch]))

        # Per-step metric scalars accumulate ON DEVICE into one [4] array
        # (order: x_t, x_1, prob, total) — sequential sum, then /n on host.
        # Host lists of per-step device scalars measured catastrophically
        # slow through the remote device tunnel at reference scale (4,045
        # steps/epoch): 16k lingering remote scalar buffers plus four
        # 4,045-operand epoch-end stacks cost minutes per epoch. The
        # sequential sum also matches the reference's own Python-float
        # accumulation order (CLIP-DDPM.py:527-536) more closely than the
        # previous mean-of-stack (differences are last-ulp fp ordering).
        t_train = _time.monotonic()
        acc_dev = jnp.zeros((4,), jnp.float32)
        n_train = 0
        metrics = None
        for batch in train_batches:
            with mesh_ctx():
                state, metrics = train_step(state, prep(batch), base_key, lam)
            timer.tick()
            # Per-dispatch poke. CAUTION: dispatch is async and the host can
            # run MINUTES ahead of the device (measured 2026-08-19: ~20k
            # combined-scale steps dispatched in ~4 min while the device
            # needed 16.6 min) — so dispatch pokes alone false-positive the
            # watchdog once the loop finishes dispatching and the host sits
            # in the epoch-end drain. DIC_DRAIN_EVERY_STEPS (below) is the
            # fix: each drain pokes at DEVICE progress. Keep it enabled for
            # any epoch whose device time exceeds the watchdog timeout.
            watchdog.poke()
            acc_dev = acc_dev + jnp.stack([metrics[n] for n in _NAMES])
            n_train += 1
            if dyn > 0:
                # Dynamic lambda on the running epoch-accumulated sums
                # (CLIP-DDPM.py:535-536 sit inside the batch loop) — pure
                # device ops, dispatched asynchronously; the host never
                # blocks on it.
                lam = jnp.where(
                    acc_dev[2] > 0,
                    (acc_dev[0] + acc_dev[1]) / acc_dev[2] * dyn,
                    lam,
                )
            if progress_fn is not None:
                progress_fn(epoch, n_train, metrics)
            if drain_every and n_train % drain_every == 0:
                jax.block_until_ready(acc_dev)
                watchdog.poke()  # the drain itself is a blocking point
                if drain_sleep:
                    _time.sleep(drain_sleep)
            if debug:
                break
        # Drain the async dispatch queue into the step-time total (the
        # in-epoch ticks only measure enqueue rate), then stop the clock:
        # validation/checkpoint time is not step time.
        timer.drain(metrics["total"] if n_train else None)
        watchdog.poke()  # first post-block point each epoch
        sums = np.asarray(acc_dev)
        train_avg = {
            name: float(s) / max(n_train, 1) for name, s in zip(_NAMES, sums)
        }

        # Validation metrics accumulate on device the same way: ONE blocking
        # fetch per epoch instead of four per val batch (the per-batch
        # float() fetches cost ~minutes per epoch through the tunnel at
        # reference scale: ~1,000 val batches x 4 round trips).
        t_val = _time.monotonic()
        if (
            epoch == cfg.epoch_num - 1
            and checkpoint_fn is not None
            and not early_stopped
        ):
            # Overlap the final checkpoint's device->host fetch with the
            # last epoch's val loop. The state is final once the train queue
            # above drained, and the host copy of params + Adam moments is
            # the dominant cost of checkpoint.save through the remote
            # tunnel (~70 s of the 74 s save leg, docs/PERF.md round-4
            # phase budget) — streaming it under the ~55-120 s val compute
            # hides most of it. copy_to_host_async populates each
            # jax.Array's cached host value, so save()'s np.asarray calls
            # find the bytes already landed. If early stop fires ON this
            # epoch the early-stop save uses this same state, so the
            # prefetch pays either way; a run already early-stopped in a
            # prior epoch writes no final checkpoint, hence the guard.
            for leaf in jax.tree.leaves(
                (state.trainable, state.frozen, state.opt_state, state.step,
                 state.ema)
            ):
                if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
                    leaf.copy_to_host_async()
        vacc_dev = jnp.zeros((3,), jnp.float32)
        n_val = 0
        group = max(cfg.eval_loss_group, 1) if eval_group_step else 1
        pend_b, pend_k = [], []

        def _flush_val_group():
            nonlocal vacc_dev, n_val
            if not pend_b:
                return
            if len(pend_b) == group:
                stacked = {
                    k2: jnp.stack([b[k2] for b in pend_b])
                    for k2 in pend_b[0]
                }
                vacc_dev = eval_group_step(
                    state, stacked, jnp.stack(pend_k), lam, vacc_dev
                )
            else:
                # Partial tail: reuse the per-batch step (already compiled)
                # rather than paying a fresh compile for a one-off [G', ...]
                # grouped shape.
                for b, k in zip(pend_b, pend_k):
                    m = eval_step(state, b, k, lam)
                    vacc_dev = vacc_dev + jnp.stack(
                        [m[n] for n in _NAMES[:3]]
                    )
            n_val += len(pend_b)
            watchdog.poke()
            pend_b.clear()
            pend_k.clear()

        for batch in val_batches:
            key, k = jax.random.split(key)
            if group > 1:
                b = prep(batch)
                if pend_b and any(
                    pend_b[0][k2].shape != b[k2].shape for k2 in b
                ):
                    _flush_val_group()  # ragged batch: never stack mixed shapes
                pend_b.append(b)
                pend_k.append(k)
                if len(pend_b) >= group:
                    _flush_val_group()
            else:
                with mesh_ctx():
                    m = eval_step(state, prep(batch), k, lam)
                vacc_dev = vacc_dev + jnp.stack([m[n] for n in _NAMES[:3]])
                watchdog.poke()
                n_val += 1
            if debug:
                break
        _flush_val_group()
        vsums = np.asarray(vacc_dev)  # blocking fetch (ends the val phase)
        val_avg = {
            name: float(s) / max(n_val, 1)
            for name, s in zip(_NAMES[:3], vsums)
        }
        if phase_times:
            t_end = _time.monotonic()
            print(
                f"[phase] epoch {epoch}: train {t_val - t_train:.1f}s "
                f"({n_train} steps) val {t_end - t_val:.1f}s ({n_val} batches)",
                file=sys.stderr, flush=True,
            )

        # Early stop: checkpoint once, keep training (CLIP-DDPM.py:548-557).
        if sum(val_avg.values()) > cfg.early_stop_ratio * train_avg["total"]:
            if not early_stopped:
                if summary is not None:
                    summary.write("early stop! \n")
                _checkpoint_guarded(checkpoint_fn, state, "early_stop", summary)
            early_stopped = True

        row = {
            "epoch": epoch,
            "train_x_t": train_avg["x_t_loss"],
            "train_x_1": train_avg["x_1_loss"],
            "train_prob": train_avg["prob_loss"],
            "val_x_t": val_avg["x_t_loss"],
            "val_x_1": val_avg["x_1_loss"],
            "val_prob": val_avg["prob_loss"],
        }
        history.append(row)
        if summary is not None and hasattr(summary, "epoch_row"):
            summary.epoch_row(row)  # structured CSV mirror (additive extra)
        if summary is not None:
            # Byte-compatible epoch line (CLIP-DDPM.py:554).
            summary.write(
                f"epoch {epoch} average x_t_loss, x_1_loss, prob_loss, val losses: "
                f"{row['train_x_t']}, {row['train_x_1']}, {row['train_prob']}, "
                f"{row['val_x_t']}, {row['val_x_1']}, {row['val_prob']}\n"
            )
            summary.flush()
        if debug:
            break

    return state, history, early_stopped


def _checkpoint_guarded(checkpoint_fn, state, tag, summary):
    """A failed checkpoint write must not kill a long training run
    (failure-resilience the reference lacks, SURVEY.md section 5.3): log
    and continue."""
    if checkpoint_fn is None:
        return
    try:
        checkpoint_fn(state, tag)
    except Exception as e:  # noqa: BLE001 — deliberate containment
        msg = f"checkpoint '{tag}' failed: {type(e).__name__}: {e}\n"
        if summary is not None:
            summary.write(msg)
            summary.flush()
        else:
            print(msg, end="")
