#!/usr/bin/env python
"""Reproduce the correlated-synthetic-world training-quality run.

This is the checked-in driver for the `runs/flagship_synthetic_correlated_*`
artifacts (previously an ad-hoc probe): flagship config, 800-image
correlated world (data/synthetic.py — captions deterministically encode
their CLIP features so from-noise BLEU measures real conditioning), full
reference-format log + BLEU. Used as the training-quality regression gate:
the loss trajectory must reproduce the archived logs to ~3 significant
digits on a math-identical tree (runs/README.md).

    python scripts/run_correlated_world.py --epochs 32 --out runs_new

Runs on whatever backend JAX selects (the real TPU by default here);
~25 min for 32 epochs on one v5e chip.
"""

import argparse
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--images", type=int, default=800)
    p.add_argument("--images30k", type=int, default=0,
                   help="also build a correlated world in the REAL Flickr30k "
                        "layout (pipe-separated captions.csv) with this many "
                        "images, sharing the 8k world's CLIP axis space, and "
                        "train on the combined vstack — the reference's "
                        "Flickr30k+8k protocol shape (README.md:15: 10 "
                        "epochs, 11 h on one A30 ≈ --images 8091 "
                        "--images30k 31783 --train_set_ratio 0.8)")
    p.add_argument("--train_set_ratio", type=float, default=0.95,
                   help="0.95 is the blessed flagship config; 0.8 is the "
                        "reference CLIP-DDPM.py default and the split the "
                        "5h-for-15-epochs A30 wall-clock baseline implies "
                        "(~4045 steps/epoch at 8k-scale --images 8091)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bleu_draws", type=int, default=1,
                   help=">1 repeats the from-noise val BLEU eval from K "
                        "independent noise draws and logs mean±sd (single "
                        "draws spread ±0.04-0.07 at convergence)")
    p.add_argument("--bleu_group", type=int, default=8,
                   help="fuse this many consecutive val batches into one "
                        "device sampling call at BLEU eval — bit-identical "
                        "scores (per-batch keys/scoring preserved), ~Gx "
                        "fewer device round-trips (Config.bleu_sample_group)")
    p.add_argument("--eval_group", type=int, default=1,
                   help="fuse this many consecutive val batches into one "
                        "device call in the per-epoch val-loss loop — "
                        "bit-identical summed metrics (lax.scan in dispatch "
                        "order, per-batch keys), ~Gx fewer host dispatches "
                        "(Config.eval_loss_group)")
    p.add_argument("--global_schedule", action="store_true",
                   help="schedule-correct segments: each continue_train "
                        "segment resumes the LR anneal (and shuffle/key "
                        "streams) at its GLOBAL epoch position over the full "
                        "--epochs protocol, instead of the reference's "
                        "restart-from-epoch-0 CONTINUE_TRAIN semantics")
    p.add_argument("--schedule_offset", type=int, default=0,
                   help="global epoch index this invocation starts at (for "
                        "external segment drivers like wedge_supervisor.sh; "
                        "combined with --global_schedule or --schedule_total)")
    p.add_argument("--schedule_total", type=int, default=0,
                   help="protocol length in epochs for the global schedule "
                        "(defaults to --epochs when --global_schedule)")
    # --- trial-grid knobs (reference ablation axes; BASELINE.md rows,
    # /root/reference/trial_*/ logs). Defaults = the flagship/README-best
    # config, which doubles as the grid's baseline arm. ---
    p.add_argument("--fusion", default="concat", choices=["concat", "add"],
                   help="CLIP-feature fusion (trial_add_concat/)")
    p.add_argument("--x0_predict", type=int, default=1,
                   help="1: predict x_0; 0: predict x_{t-100} "
                        "(trial_x_01_prediction/)")
    p.add_argument("--rounding_weight", type=float, default=0.3,
                   help="lambda on the rounding loss "
                        "(trial_rounding_weight/: 0.3 vs 0.5)")
    p.add_argument("--scheduler", default="linspace",
                   choices=["linspace", "logspace", "cosine_annealing"],
                   help="LR schedule shape (trial_lr/)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--end_lr", type=float, default=5e-5)
    p.add_argument("--class_weight", type=float, default=0.0,
                   help="classifier-free guidance w "
                        "(trial_classification_free/: 1.0 / 0.3)")
    p.add_argument("--class_prob", type=float, default=0.2,
                   help="per-row text-cond dropout prob for CFG training")
    p.add_argument("--train_embedding", type=int, default=0,
                   help="1: learn 16-d embeddings + in/out projections over "
                        "a DictTokenizer vocab built from the captions "
                        "(trial_train_embedding/; reference TRAIN_EMBEDDING, "
                        "CLIP-DDPM.py:202-207)")
    p.add_argument("--dict_char_slice", type=int, default=0,
                   help="1: reproduce the reference's DictTokenizer "
                        "character-slice quirk (CLIP-DDPM.py:184) — only "
                        "meaningful with --train_embedding 1")
    p.add_argument("--dynamic_rounding_weight", type=float, default=-1,
                   help="dynamic lambda: after every batch, lambda is "
                        "re-fit to this multiple of the running "
                        "(x_t+x_1)/prob loss-sum ratio, keeping the rounding "
                        "term commensurate with the diffusion terms "
                        "(trial_rounding_weight/ dynamic1/dynamic3; "
                        "reference CLIP-DDPM.py:535-536; -1 = off)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="track an EMA of the trainable params on device and "
                        "log an additive 'BLEU-4 ema' line at each segment "
                        "end (Config.ema_decay; 0 = off, reference-exact)")
    p.add_argument("--refine_steps_eval", type=int, default=None,
                   help="override Config.refine_steps_eval (reference-exact "
                        "5, CLIP-DDPM.py:616) for sampler-step-sensitivity "
                        "probes — NOT part of the run-name codec, so "
                        "--bleu_only re-scores an existing checkpoint at a "
                        "different refinement depth; point --out at a COPY "
                        "of the run dir to keep off-protocol scores out of "
                        "the contractual log")
    p.add_argument("--world_dir", default="/tmp/corrworld_ck")
    p.add_argument("--world30_dir", default="/tmp/corrworld30_ck")
    p.add_argument("--out", default=".")
    p.add_argument("--name", default=None,
                   help="rename the log to runs/-style <name>.txt after")
    p.add_argument("--resume", action="store_true",
                   help="first segment also resumes (continue_train) from "
                        "the run's existing checkpoint — re-drive a wedged "
                        "run with the REMAINING --epochs/--segments. The "
                        "per-segment epoch_num (epochs/segments) must match "
                        "the original invocation's, since it is part of the "
                        "run-name codec the checkpoint lives under.")
    p.add_argument("--bleu_only", action="store_true",
                   help="skip training: restore the run's checkpoint + saved "
                        "val split and run ONLY the end-of-run val BLEU loop, "
                        "appending the 'BLEU-4 draws'/'BLEU-4 score:' lines "
                        "to the codec-named log. Wedge recovery for a "
                        "segment that died after its checkpoint save but "
                        "before its BLEU lines (pipeline.run_flickr_bleu_only)")
    p.add_argument("--segments", type=int, default=1,
                   help="split the run into N continue_train segments of "
                        "epochs/N each. Long-run wedge mitigation: the "
                        "remote tunnel has been seen freezing runs that "
                        "step continuously for ~35-40 min (CLAUDE.md), and "
                        "a wedged segment can simply be re-run — "
                        "continue_train resumes from the last checkpoint. "
                        "The LR schedule restarts per segment (cyclic "
                        "restarts); BLEU is scored at every segment end, "
                        "giving a BLEU-vs-training trajectory in one log.")
    args = p.parse_args()

    import dataclasses

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu import pipeline
    from diffusion_image_captioning_tpu.config import Config, model_name
    from diffusion_image_captioning_tpu.data.synthetic import (
        synthetic_correlated_flickr30k_dir,
        synthetic_correlated_flickr_dir,
    )

    if args.epochs % args.segments:
        raise SystemExit("--epochs must divide evenly by --segments")
    cfg = Config(
        epoch_num=args.epochs // args.segments,
        rounding_weight=args.rounding_weight,
        train_set_ratio=args.train_set_ratio,
        early_stop_ratio=1.02,
        bleu_draws=args.bleu_draws,
        bleu_sample_group=args.bleu_group,
        eval_loss_group=args.eval_group,
        clip_adding_method=args.fusion,
        x_0_prediction=bool(args.x0_predict),
        scheduler=args.scheduler,
        learning_rate=args.lr,
        end_learning_rate=args.end_lr,
        classifier_free_weight=args.class_weight,
        classifier_free_prob=args.class_prob,
        ema_decay=args.ema_decay,
        train_embedding=bool(args.train_embedding),
        dict_char_slice=bool(args.dict_char_slice),
        dynamic_rounding_weight=args.dynamic_rounding_weight,
    )
    if args.refine_steps_eval is not None:
        cfg = dataclasses.replace(cfg, refine_steps_eval=args.refine_steps_eval)
    sched_total = args.schedule_total or (
        args.epochs if args.global_schedule else 0
    )
    d = synthetic_correlated_flickr_dir(args.world_dir, n_images=args.images,
                                        seed=args.seed)
    d30 = None
    if args.images30k:
        d30 = synthetic_correlated_flickr30k_dir(
            args.world30_dir, n_images=args.images30k,
            seed=args.seed + 1000, axes_seed=args.seed,
        )
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    if args.bleu_only:
        c = dataclasses.replace(cfg, continue_train=True)
        if sched_total:
            c = dataclasses.replace(
                c,
                schedule_offset_epochs=args.schedule_offset,
                schedule_total_epochs=sched_total,
            )
        bleu = pipeline.run_flickr_bleu_only(c, d, d30, out_dir=args.out)
        print(f"bleu_only: {bleu} ({time.time() - t0:.0f} s)")
        return
    per_seg = args.epochs // args.segments
    for seg in range(args.segments):
        c = dataclasses.replace(cfg, continue_train=args.resume or seg > 0)
        if sched_total:
            c = dataclasses.replace(
                c,
                schedule_offset_epochs=args.schedule_offset + seg * per_seg,
                schedule_total_epochs=sched_total,
            )
        pipeline.run_flickr_training(c, d, d30, out_dir=args.out)
        print(f"segment {seg + 1}/{args.segments} done "
              f"({time.time() - t0:.0f} s)", flush=True)
    wall = time.time() - t0
    log = os.path.join(args.out, model_name(cfg) + ".txt")
    print(f"wall: {wall:.0f} s; log: {log}")
    if args.name:
        dst = os.path.join(args.out, args.name + ".txt")
        shutil.copyfile(log, dst)
        print(f"copied to {dst}")


if __name__ == "__main__":
    main()
