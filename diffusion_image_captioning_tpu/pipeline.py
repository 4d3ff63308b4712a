"""End-to-end pipelines: the orchestration the reference performs inline in
its scripts (CLIP-DDPM.py top-to-bottom flow, lm-trial/main.py), as library
functions consumed by the thin CLIs in scripts/.

Flow parity (CLIP-DDPM.py):
    data -> split (or CONTINUE_TRAIN restore) -> model -> fit (epoch loop,
    early stop, log lines) -> qualitative demos (multi-step inference,
    t-effectiveness) -> val-split BLEU-4 -> final artifacts (checkpoint +
    val-split save).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_captioning_tpu import checkpoint as ck
from diffusion_image_captioning_tpu import eval_bleu, sample, schedules
from diffusion_image_captioning_tpu import train as tr
from diffusion_image_captioning_tpu.config import Config, model_name
from diffusion_image_captioning_tpu.data import Batcher, split_indices
from diffusion_image_captioning_tpu.data import flickr as flickr_data
from diffusion_image_captioning_tpu.data import textonly
from diffusion_image_captioning_tpu.data.tokenizers import (
    DictTokenizer,
    WordPieceTokenizer,
    build_caption_vocab,
    build_wordpiece_vocab,
)
from diffusion_image_captioning_tpu.logging_utils import Summary
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from diffusion_image_captioning_tpu.models.hf_convert import load_pretrained_embedding


def build_eval_tokenizer(cfg: Config, assets_dir, captions_csv=None):
    """Reconstruct the TRAINING tokenizer for an eval/demo script.

    Checkpoints carry no vocab (the reference rebuilds it from the training
    captions at interpreter startup — COCO_BLEU.py imports the same
    module-level builder), so eval needs either assets_dir/vocab.txt (the
    pretrained-WordPiece path) or the training captions CSV. Errors loudly
    instead of silently decoding everything to UNK from an empty vocab."""
    caps: list[str] = []
    if captions_csv:
        from diffusion_image_captioning_tpu.data import flickr as _fl

        _, caps = _fl.read_captions_csv(captions_csv)
    if cfg.train_embedding and not caps:
        raise SystemExit(
            "train_embedding checkpoint: pass --captions <training csv> "
            "to rebuild the DictTokenizer vocabulary (a checkpoint "
            "carries no vocab; an empty one decodes everything to UNK)"
        )
    vocab_path = assets_dir and os.path.join(assets_dir, "vocab.txt")
    if (
        not cfg.train_embedding
        and not caps
        and not (vocab_path and os.path.exists(vocab_path))
    ):
        raise SystemExit(
            "no tokenizer source: pass --assets_dir with vocab.txt or "
            "--captions <training csv> (an empty vocab decodes everything "
            "to UNK)"
        )
    # Selection itself is the TRAINING builder — one precedence order, so
    # eval can never decode with a different vocab than training built.
    return build_tokenizer(cfg, caps, assets_dir)


def load_clip_vision_params(enc, assets_dir, *, allow_random=False):
    """CLIP vision params from local HF assets; hard error when absent
    unless explicitly overridden — random CLIP weights condition the model
    on noise and produce silently-meaningless captions/scores."""
    import jax as _jax
    import jax.numpy as _jnp

    params = enc.init(
        _jax.random.PRNGKey(0), _jnp.zeros((1, 224, 224, 3), _jnp.float32)
    )["params"]
    clip_dir = assets_dir and os.path.join(
        assets_dir, "openai", "clip-vit-base-patch32-local"
    )
    if clip_dir and os.path.isdir(clip_dir):
        from diffusion_image_captioning_tpu.models.hf_convert import (
            apply_flat_updates,
            convert_clip_vision,
        )

        return apply_flat_updates(params, convert_clip_vision(clip_dir))
    if allow_random:
        print(
            "WARNING: using RANDOM-INIT CLIP vision weights "
            "(--allow_random_clip) - outputs are smoke-test only",
            file=sys.stderr,
        )
        return params
    raise SystemExit(
        "CLIP assets not found under --assets_dir "
        "(openai/clip-vit-base-patch32-local); refusing to condition on "
        "random weights. Pass --allow_random_clip for a smoke test."
    )


def build_tokenizer(cfg: Config, captions: list[str], assets_dir: Optional[str]):
    """TRAIN_EMBEDDING -> caption-frequency DictTokenizer (CLIP-DDPM.py:
    132-165); otherwise WordPiece from a vocab.txt under assets_dir (the HF
    DistilBERT vocab when available, CLIP-DDPM.py:205) or a corpus-built
    subword vocab as the hermetic fallback."""
    if cfg.train_embedding:
        return DictTokenizer(build_caption_vocab(captions), char_slice=cfg.dict_char_slice)
    vocab_path = assets_dir and os.path.join(assets_dir, "vocab.txt")
    if vocab_path and os.path.exists(vocab_path):
        return WordPieceTokenizer.from_file(vocab_path)
    return WordPieceTokenizer(build_wordpiece_vocab(captions, vocab_size=cfg.vocab_size))


def write_demos(
    summary,
    model,
    cfg: Config,
    params,
    val_columns: dict,
    val_indices: np.ndarray,
    tokenizer,
    seed: int = 0,
    watchdog=None,
):
    """Qualitative demos appended to the run log (CLIP-DDPM.py:575-602):
    (a) 10-step refinement from x_999 of a val caption, decoding each step;
    (b) single-shot restoration at t = 1, 101, ..., 901.

    `watchdog` (StallWatchdog) is poked per decoded row: a demo leg
    legitimately slower than DIC_STALL_TIMEOUT_S (scales with
    refine_steps_demo) must not read as a wedge (ADVICE round-4)."""

    def _poke():
        if watchdog is not None:
            watchdog.poke()

    abar = schedules.alpha_cumprod_table(cfg)
    i = int(val_indices[0])
    text = val_columns["caption"][i] if "caption" in val_columns else val_columns["text"][i]
    summary.write(f"origin text: {text}\n")
    # byte-identical "t = 999" at the default step_tot=1000
    summary.write(f"t = {cfg.step_tot - 1}\n")

    ids = jnp.asarray(val_columns["input_ids"][i : i + 1])
    mask = jnp.asarray(val_columns["attention_mask"][i : i + 1], jnp.float32)
    clip = (
        jnp.asarray(val_columns["image_clip"][i : i + 1])
        if "image_clip" in val_columns
        else jnp.zeros((1, cfg.clip_dim), jnp.float32)
    )
    x0 = model.apply({"params": params}, ids, method="embed")

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    from diffusion_image_captioning_tpu.diffusion import q_sample

    t_hi = jnp.asarray([cfg.step_tot - 1], jnp.int32)
    x_t = q_sample(abar, x0, t_hi, k1, shared_noise=False)

    _, _, logits_seq = sample.refine(
        model, cfg, params, x_t, clip,
        steps=cfg.refine_steps_demo, collect_logits=True,
    )
    _poke()  # refine() returned: the big device leg completed
    for step_logits in np.asarray(logits_seq):
        # demo decode is a plain argmax, no dedup (CLIP-DDPM.py:594)
        dec = tokenizer.decode(step_logits.argmax(-1)[0])
        summary.write(f"inferred: {dec}\n")
        _poke()

    summary.write("text t effectiveness\n")
    probes = jnp.arange(1, cfg.step_tot, 100, dtype=jnp.int32)
    logits = sample.restore_at_t(
        model, cfg, params, abar, x0, probes, clip, mask, k2
    )
    _poke()
    for t_val, row_logits in zip(np.asarray(probes), np.asarray(logits)):
        dec = tokenizer.decode(row_logits.argmax(-1))
        summary.write(f"t: {int(t_val)} restore: {dec}\n")
        _poke()
    summary.flush()


def write_lm_demos(
    summary,
    model,
    cfg: Config,
    params,
    columns: dict,
    val_indices: np.ndarray,
    tokenizer,
    seed: int = 0,
):
    """Text-only qualitative demo — the lm-trial multi-step restore
    (lm-trial/main.ipynb cell 21; same shape as CLIP-DDPM.py:591-602):
    (a) decode x0 straight through the vocab head ("x_0 ground truth");
    (b) q-sample a val sentence to t=25 and decode 5 successive model
        applications ("inferred:");
    (c) single-shot restoration at t = 5, 30, ..., <500 ("t effectiveness").
    Demo decodes are plain argmax, no dedup (cell 21 `out.argmax(dim=-1)`)."""
    abar = schedules.alpha_cumprod_table(cfg)
    i = int(val_indices[0])
    summary.write(f"origin text: {columns['text'][i]}\n")

    ids = jnp.asarray(columns["input_ids"][i : i + 1])
    mask = jnp.asarray(columns["attention_mask"][i : i + 1], jnp.float32)
    x0 = model.apply({"params": params}, ids, method="embed")
    gt_logits = model.apply({"params": params}, x0, method="decode_logits")
    summary.write(
        f"x_0 ground truth: {tokenizer.decode(np.asarray(gt_logits).argmax(-1)[0])}\n"
    )

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    from diffusion_image_captioning_tpu.diffusion import q_sample

    t0 = min(25, cfg.step_tot - 1)  # cell 21 noises to t=25
    summary.write(f"t = {t0}\n")
    x_t = q_sample(
        abar, x0, jnp.asarray([t0], jnp.int32), k1, shared_noise=False
    )
    _, _, logits_seq = sample.refine(
        model, cfg, params, x_t, None, steps=5, collect_logits=True
    )
    for step_logits in np.asarray(logits_seq):
        summary.write(f"inferred: {tokenizer.decode(step_logits.argmax(-1)[0])}\n")

    summary.write("text t effectiveness\n")
    probes = jnp.arange(5, min(500, cfg.step_tot), 25, dtype=jnp.int32)
    logits = sample.restore_at_t(
        model, cfg, params, abar, x0, probes,
        jnp.zeros((1, cfg.clip_dim), jnp.float32), mask, k2,
    )
    for t_val, row_logits in zip(np.asarray(probes), np.asarray(logits)):
        summary.write(f"t: {int(t_val)} restore: {tokenizer.decode(row_logits.argmax(-1))}\n")
    summary.flush()


class _NullSummary:
    """Write sink for auxiliary eval passes (e.g. the EMA BLEU leg) whose
    scores go into the real log as additive lines — run_val_bleu's own
    draws/score writes must not reach the contractual log twice."""

    def write(self, *_args) -> None:
        pass

    def flush(self) -> None:
        pass


def run_val_bleu(
    summary,
    model,
    cfg: Config,
    params,
    val_batcher,
    tokenizer,
    gt_table: dict,
    seed: int = 0,
    watchdog=None,
) -> float:
    """Val-split BLEU-4 loop (CLIP-DDPM.py:604-631): 5-step sampling from
    noise, dedup-decode, all GT captions per image as references, per-batch
    corpus BLEU averaged over batches.

    cfg.bleu_draws > 1 repeats the whole loop from independent noise draws
    and logs mean ± sd (the from-noise eval is stochastic with measured
    ±0.04-0.07 spread at convergence — VERDICT round-2 item 4); draw 0 uses
    the exact key stream of the single-draw protocol.

    cfg.bleu_sample_group > 1 fuses that many consecutive batches into one
    device sampling call (sample.sample_caption_ids_grouped) — per-batch
    keys, decode and scoring are preserved exactly, so scores match the
    G=1 loop bit-for-bit while paying ~G× fewer device round-trips."""
    import time as _time

    draws = max(cfg.bleu_draws, 1)
    group = max(cfg.bleu_sample_group, 1)
    phase_times = bool(os.environ.get("DIC_PHASE_TIMES"))
    scores, n = [], 0
    t_sample = t_score = 0.0

    def score_batch(batch, ids) -> float:
        cands = [tokenizer.decode(row) for row in sample.dedup_consecutive(ids)]
        refs = [gt_table[img] for img in batch["image"]]
        return eval_bleu.flickr_batch_bleu(cands, refs)

    for d in range(draws):
        key = jax.random.PRNGKey(seed)
        if d:
            key = jax.random.fold_in(key, d)
        acc = 0.0
        n = 0
        pend_b, pend_k = [], []

        def flush():
            nonlocal acc, n, t_sample, t_score
            if not pend_b:
                return
            t0 = _time.monotonic()
            if len(pend_b) == 1:
                ids = sample.sample_caption_ids(
                    model, cfg, params, jnp.asarray(pend_b[0]["image_clip"]),
                    pend_k[0], steps=cfg.refine_steps_eval,
                )  # argmax on device: ships [B, L] ids, not [B, L, V] logits
            else:
                ids = sample.sample_caption_ids_grouped(
                    model, cfg, params,
                    [b["image_clip"] for b in pend_b], pend_k,
                    steps=cfg.refine_steps_eval,
                )
            t1 = _time.monotonic()
            B = len(pend_b[0]["image"])
            for i, b in enumerate(pend_b):
                acc += score_batch(b, ids[i * B : (i + 1) * B])
                n += 1
            t_sample += t1 - t0
            t_score += _time.monotonic() - t1
            pend_b.clear()
            pend_k.clear()
            if watchdog is not None:
                # each flush blocks on a device fetch — the poke cadence a
                # supervisor needs to tell a healthy eval leg from a wedged
                # one (segment a2, 2026-08-20: the BLEU leg wedged and only
                # the segment-cap timeout caught it, ~45 min late)
                watchdog.poke()

        for batch in val_batcher:
            key, k = jax.random.split(key)
            if pend_b and len(batch["image"]) != len(pend_b[0]["image"]):
                flush()  # ragged tail batch: never mix row counts in a group
            pend_b.append(batch)
            pend_k.append(k)
            if len(pend_b) >= group:
                flush()
            if cfg.debug:
                break
        flush()
        scores.append(acc / max(n, 1))
    if phase_times and n:
        print(
            f"[phase] val BLEU: sample {t_sample:.1f}s score {t_score:.1f}s "
            f"({draws} draw(s) x {n} batches, group {group})",
            file=sys.stderr, flush=True,
        )
    if n == 0:
        # drop-last batching: a val split smaller than batch_size yields
        # ZERO batches — a logged 0.0 would masquerade as a real score
        # (and the same empty batcher disabled fit's early-stop signal)
        print(
            "WARNING: val split yielded no batches "
            "(len(val) < batch_size?) — 'BLEU-4 score: 0.0' below is a "
            "configuration artifact, not a measurement",
            file=sys.stderr,
        )
    if draws > 1:
        mean = float(np.mean(scores))
        sd = float(np.std(scores, ddof=1))
        # Additive observability line BEFORE the contractual final line (the
        # epoch-line parser keys on 'epoch ' / 'BLEU-4 score:' prefixes).
        summary.write(
            f"BLEU-4 draws (n={draws}): mean {mean:.6f} sd {sd:.6f} "
            f"values {[round(s, 6) for s in scores]}\n"
        )
        score = mean
    else:
        score = scores[0]
    # NO trailing newline: the reference's final log write is
    # `summary.write(f"BLEU-4 score: {...}")` (CLIP-DDPM.py:631) and the
    # line format is byte-contractual (logs end without a newline).
    summary.write(f"BLEU-4 score: {score}")
    summary.flush()
    return score


def run_flickr_bleu_only(
    cfg: Config,
    flickr8k_dir: Optional[str],
    flickr30k_dir: Optional[str],
    out_dir: str = ".",
    assets_dir: Optional[str] = None,
    seed: int = 0,
) -> float:
    """Standalone val-split BLEU eval of an existing checkpointed run — the
    reference's end-of-training eval loop (CLIP-DDPM.py:604-631) detached
    from training.

    Two uses: (a) score any saved checkpoint without retraining (the
    reference can only produce this number by rerunning main()); (b) wedge
    recovery — if a segment dies AFTER its in-fit checkpoint save but BEFORE
    its BLEU lines land (the eval leg is a device-heavy tunnel phase,
    observed wedged 2026-08-20), this appends the exact missing lines:
    run_val_bleu's key stream depends only on `seed` and the saved val
    split, both restored here, so the scores are the ones the interrupted
    segment would have written.

    Requires the run's checkpoint + saved val indices under the cfg codec
    name in `out_dir`. Appends to the codec-named log exactly like the end
    of run_flickr_training; returns the BLEU mean."""
    name = model_name(cfg)
    imgs, caps, img_feat, txt_feat = flickr_data.load_combined(
        flickr8k_dir, flickr30k_dir
    )
    tokenizer = build_tokenizer(cfg, caps, assets_dir)
    if cfg.train_embedding:
        cfg = cfg.replace(vocab_size=tokenizer.vocab_size)
    columns = flickr_data.make_flickr_dataset(
        imgs, caps, img_feat, txt_feat, tokenizer, cfg.max_length
    )
    val_idx = ck.load_val_indices(name, out_dir)
    val_b = Batcher(columns, val_idx, cfg.batch_size, shuffle=False)

    model, params = init_denoiser(cfg, jax.random.PRNGKey(seed))
    params, _ = load_pretrained_embedding(
        params, assets_dir and os.path.join(assets_dir, "distilbert-base-uncased-local")
    )
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    state, _, _ = ck.restore(name, out_dir, template=state)
    params = tr.merge_params(state.trainable, state.frozen)

    from diffusion_image_captioning_tpu.utils.profiling import StallWatchdog

    summary = Summary(cfg, out_dir)
    gt = flickr_data.captions_by_image(imgs, caps)
    eval_wd = StallWatchdog(
        timeout_s=float(os.environ.get("DIC_STALL_TIMEOUT_S", "600")),
        label="eval",
    ).start()
    try:
        if state.ema is not None:
            # Rescue parity with run_flickr_training: an unwedged
            # ema_decay>0 segment writes the additive "BLEU-4 ema" line
            # before the contractual raw "BLEU-4 score:" — the --bleu_only
            # recovery must append the SAME lines or a rescued segment
            # permanently lacks its EMA score (ADVICE round-3, medium).
            #
            # But not twice: if a PREVIOUS rescue attempt landed the ema
            # line and then wedged during the raw leg, re-writing it here
            # would leave two ema lines for one segment and shift
            # combined_summary's end-aligned ema->segment mapping off by
            # one for every earlier segment (ADVICE round-4). A trailing
            # ema line not yet followed by a raw "BLEU-4 score:" means
            # this segment's ema leg already completed — skip to raw.
            ema_done = False
            try:
                with open(summary.path, encoding="utf-8") as _f:
                    _text = _f.read()
                _last = _text.rfind("BLEU-4 ema")
                ema_done = (
                    _last >= 0 and "BLEU-4 score:" not in _text[_last:]
                )
            except OSError:
                pass
            if ema_done:
                print(
                    "[bleu_only] trailing 'BLEU-4 ema' line already present "
                    "without a raw score — skipping the EMA leg",
                    file=sys.stderr, flush=True,
                )
            else:
                ema_bleu = run_val_bleu(
                    _NullSummary(), model, cfg,
                    tr.merge_params(state.ema, state.frozen),
                    val_b, tokenizer, gt, seed, watchdog=eval_wd,
                )
                summary.write(
                    f"BLEU-4 ema (decay={cfg.ema_decay}): {ema_bleu}\n"
                )
                summary.flush()
        bleu = run_val_bleu(
            summary, model, cfg, params, val_b, tokenizer, gt, seed,
            watchdog=eval_wd,
        )
    finally:
        eval_wd.stop()
    summary.close()
    return bleu


def run_flickr_training(
    cfg: Config,
    flickr8k_dir: Optional[str],
    flickr30k_dir: Optional[str],
    out_dir: str = ".",
    assets_dir: Optional[str] = None,
    seed: int = 0,
):
    """The full CLIP-DDPM.py program. Returns (state, history, bleu)."""
    import time as _time

    from diffusion_image_captioning_tpu.utils.profiling import mem_report

    # DIC_PHASE_TIMES: per-phase wall-clock on stderr (data/init/fit/demos/
    # bleu/save). fit() and run_val_bleu add their own inner splits under the
    # same flag — together these are the eval-overhead budget docs/PERF.md
    # quotes (the combined protocol spent ~50% of each epoch outside train
    # steps before round 4's grouped-BLEU/segmenting fixes).
    phase_times = bool(os.environ.get("DIC_PHASE_TIMES"))
    _t0 = _time.monotonic()
    _last = [_t0]

    def _phase(label: str) -> None:
        if phase_times:
            now = _time.monotonic()
            print(
                f"[phase] pipeline {label}: {now - _last[0]:.1f}s "
                f"(total {now - _t0:.1f}s)",
                file=sys.stderr, flush=True,
            )
            _last[0] = now

    # Sub-splits inside the "data" and "model init + restore" legs
    # (VERDICT round-4 next #4): separate timer so the existing leg-total
    # lines (quoted in README/PERF tables) keep their meaning.
    _sub_t = [_t0]

    def _sub(label: str) -> None:
        if phase_times:
            now = _time.monotonic()
            print(
                f"[phase] init sub {label}: {now - _sub_t[0]:.1f}s",
                file=sys.stderr, flush=True,
            )
            _sub_t[0] = now

    name = model_name(cfg)
    imgs, caps, img_feat, txt_feat = flickr_data.load_combined(
        flickr8k_dir, flickr30k_dir
    )
    _sub("load_combined")
    tokenizer = build_tokenizer(cfg, caps, assets_dir)
    _sub("build_tokenizer")
    if cfg.train_embedding:
        # Size the embedding/lm_head to the built caption vocab exactly
        # like the reference (nn.Embedding(len(vocab_dict), ...),
        # CLIP-DDPM.py:202-207) — the 30522 default is the WordPiece
        # vocab. vocab_size is not a run-name-codec field, so `name`
        # computed above is unaffected. (run_lm_trial already did this.)
        cfg = cfg.replace(vocab_size=tokenizer.vocab_size)
    columns = flickr_data.make_flickr_dataset(
        imgs, caps, img_feat, txt_feat, tokenizer, cfg.max_length
    )
    _sub("tokenize_columns")
    # The reference snapshots memory at four pipeline milestones
    # (mem_report() at CLIP-DDPM.py:223,447,563 plus import time); same
    # cadence here, printed to stdout like the reference.
    mem_report("data")
    _phase("data")
    n = len(caps)
    _sub_t[0] = _time.monotonic()
    _init_sub = _sub

    if cfg.continue_train:
        val_idx = ck.load_val_indices(name, out_dir)
        train_idx = np.setdiff1d(np.arange(n), val_idx)
        # Bit-exact segmented resume: setdiff1d returns the train rows
        # SORTED, but the original run's train_idx was the seed permutation's
        # prefix — and Batcher's shuffle permutes element *positions*, so a
        # different base order yields different batches. When the saved val
        # split is exactly this (n, ratio, seed)'s split, restore the
        # original order so a schedule-correct segment replays the
        # monolithic run's batch sequence (tests/test_schedule_offset.py).
        t2, v2 = split_indices(n, cfg.train_set_ratio, seed)
        if np.array_equal(v2, val_idx):
            train_idx = t2
    else:
        train_idx, val_idx = split_indices(n, cfg.train_set_ratio, seed)

    train_b = Batcher(columns, train_idx, cfg.batch_size, shuffle=True, seed=seed)
    # Schedule-correct segment: replay the shuffle stream to this segment's
    # global epoch position (no-op at the reference-semantics default 0).
    train_b.advance_epochs(cfg.schedule_offset_epochs)
    val_b = Batcher(columns, val_idx, cfg.batch_size, shuffle=False)
    _init_sub("split+batchers")

    model, params = init_denoiser(cfg, jax.random.PRNGKey(seed))
    _init_sub("init_denoiser")
    params, loaded = load_pretrained_embedding(
        params, assets_dir and os.path.join(assets_dir, "distilbert-base-uncased-local")
    )
    if not loaded and cfg.freeze_embedding:
        # Without pretrained weights the frozen embedding/lm_head are RANDOM
        # and never trained — the run exercises the machinery but cannot
        # reach reference BLEU. Say so loudly in the log and on stderr.
        msg = ("WARNING: no pretrained DistilBERT assets found - training "
               "against a frozen RANDOM embedding/vocab head (BLEU will not "
               "be meaningful; pass assets_dir or set freeze_embedding=False)")
        print(msg, file=sys.stderr)
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    _init_sub("opt+state init")
    if cfg.continue_train:
        if cfg.schedule_offset_epochs or cfg.schedule_total_epochs:
            # Schedule-correct segment: resume the FULL training state
            # (params + Adam moments + step counter) so the segment
            # continues the monolithic run exactly — the reference's
            # params-only CONTINUE_TRAIN (below) resets the optimizer and
            # the step-keyed RNG stream along with the LR schedule.
            state, _, _ = ck.restore(name, out_dir, template=state)
        else:
            state = ck.restore_params_only(name, out_dir, state)
        _init_sub("ckpt restore")

    # Multi-chip training (SURVEY section 2.14; new capability): when the
    # config asks for a real mesh, initialize multi-host if applicable,
    # shard the whole TrainState per the DPxTP layout, and let fit() shard
    # every batch over the data axis — GSPMD inserts the grad all-reduce.
    mesh = None
    if cfg.mesh_data * cfg.mesh_model > 1:
        from diffusion_image_captioning_tpu.parallel import mesh as mesh_lib

        mesh_lib.init_distributed()
        n_dev = len(jax.devices())
        if cfg.mesh_data * cfg.mesh_model > n_dev:
            raise SystemExit(
                f"mesh {cfg.mesh_data}x{cfg.mesh_model} needs "
                f"{cfg.mesh_data * cfg.mesh_model} devices, have {n_dev}"
            )
        if cfg.batch_size % cfg.mesh_data:
            raise SystemExit(
                f"batch_size {cfg.batch_size} must divide evenly over "
                f"mesh_data={cfg.mesh_data}"
            )
        mesh = mesh_lib.make_mesh(
            data=cfg.mesh_data,
            model=cfg.mesh_model,
            devices=jax.devices()[: cfg.mesh_data * cfg.mesh_model],
        )
        state = jax.device_put(state, mesh_lib.param_shardings(state, mesh))
    mem_report("model")
    _phase("model init + restore")

    summary = Summary(cfg, out_dir)

    def checkpoint_fn(s, tag):
        t0 = _time.monotonic()
        ck.save(s, cfg, name, out_dir, val_indices=val_idx)
        if phase_times:
            print(
                f"[phase] checkpoint save ({tag}): "
                f"{_time.monotonic() - t0:.1f}s",
                file=sys.stderr, flush=True,
            )

    if not loaded and cfg.freeze_embedding:
        summary.write("note: frozen embedding is RANDOM (no pretrained assets)\n")
    state, history = tr.fit(
        model, cfg, state, train_b, val_b,
        seed=seed, summary=summary, checkpoint_fn=checkpoint_fn, tx=tx,
        mesh=mesh,
    )
    mem_report("train")
    _phase("fit (train+val epochs + ckpt)")

    params = tr.merge_params(state.trainable, state.frozen)
    # The post-fit legs (demos + from-noise BLEU) are device-heavy tunnel
    # phases with no watchdog of their own — segment a2 of the v2 combined
    # protocol wedged HERE (2026-08-20) and burned silently until the
    # supervisor's whole-segment cap. Same detector as fit(), same
    # supervisor-greppable "no progress" line.
    from diffusion_image_captioning_tpu.utils.profiling import StallWatchdog

    eval_wd = StallWatchdog(
        timeout_s=float(os.environ.get("DIC_STALL_TIMEOUT_S", "600")),
        label="eval",
    ).start()
    try:
        write_demos(
            summary, model, cfg, params, columns, val_idx, tokenizer, seed,
            watchdog=eval_wd,
        )
        eval_wd.poke()
        _phase("demos")
        gt = flickr_data.captions_by_image(imgs, caps)
        if state.ema is not None:
            # EMA weights scored as an ADDITIVE line before the contractual
            # final "BLEU-4 score:" (which must stay last, newline-less, and
            # score the raw params — byte parity). Same val split, same key
            # stream, so the two scores are directly comparable.
            ema_bleu = run_val_bleu(
                _NullSummary(), model, cfg,
                tr.merge_params(state.ema, state.frozen),
                val_b, tokenizer, gt, seed, watchdog=eval_wd,
            )
            summary.write(f"BLEU-4 ema (decay={cfg.ema_decay}): {ema_bleu}\n")
            summary.flush()
            _phase("ema BLEU")
        bleu = run_val_bleu(
            summary, model, cfg, params, val_b, tokenizer, gt, seed,
            watchdog=eval_wd,
        )
    finally:
        eval_wd.stop()
    mem_report("eval")
    _phase("val BLEU")
    ck.save_val_indices(name, out_dir, val_idx)
    summary.close()
    _phase("final save")
    return state, history, bleu


def run_lm_trial(
    cfg: Config,
    train_csv: str,
    out_dir: str = ".",
    seed: int = 0,
):
    """The lm-trial precursor (lm-trial/main.py): text-only training on a
    CSV, final checkpoint. Returns (state, history, tokenizer)."""
    texts = textonly.read_text_column(train_csv)
    columns, tokenizer = textonly.make_text_dataset(
        texts, cfg.max_length, vocab_size=cfg.vocab_size
    )
    # lm-trial trains on everything and has no val loop; we reuse a small
    # held-out slice for the early-stop signal (additive improvement).
    n = len(texts)
    train_idx, val_idx = split_indices(n, 0.95, seed)
    train_b = Batcher(columns, train_idx, cfg.batch_size, shuffle=True, seed=seed)
    val_b = Batcher(columns, val_idx, cfg.batch_size, shuffle=False)

    cfg = cfg.replace(vocab_size=tokenizer.vocab_size)
    model, params = init_denoiser(cfg, jax.random.PRNGKey(seed))
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)

    summary = Summary(cfg, out_dir)
    name = model_name(cfg)
    state, history = tr.fit(
        model, cfg, state, train_b, val_b,
        seed=seed, summary=summary,
        checkpoint_fn=lambda s, tag: ck.save(s, cfg, name, out_dir),
    )
    # Multi-step restore demo (lm-trial/main.ipynb cell 21) — the text-only
    # analog of write_demos, appended to the run log like the flickr path.
    params = tr.merge_params(state.trainable, state.frozen)
    write_lm_demos(summary, model, cfg, params, columns, val_idx, tokenizer, seed)
    summary.close()
    return state, history, tokenizer
