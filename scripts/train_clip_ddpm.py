#!/usr/bin/env python
"""Flagship training CLI — the CLIP-DDPM.py program as a command.

The reference is configured by editing module constants; here every knob is
a --flag named after its Config field, with the reference defaults
(CLIP-DDPM.py:55-115). Example:

    python scripts/train_clip_ddpm.py --flickr8k_dir ./flickr8k \
        --epoch_num 15 --rounding_weight 0.3 --train_set_ratio 0.95 \
        --early_stop_ratio 1.02 --out_dir runs/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_image_captioning_tpu.config import (  # noqa: E402
    add_config_flags,
    config_from_args,
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--flickr8k_dir", default=None)
    p.add_argument("--flickr30k_dir", default=None)
    p.add_argument("--assets_dir", default=None, help="dir with vocab.txt / HF saves")
    p.add_argument("--out_dir", default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax NaN checking (slow; forces sync dispatch)",
    )
    p.add_argument(
        "--profile_dir", default=None,
        help="write a jax.profiler trace of the run here",
    )
    add_config_flags(p)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in "
                        "this image — a startup hook initializes TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    if not (args.flickr8k_dir or args.flickr30k_dir):
        p.error(
            "pass --flickr8k_dir and/or --flickr30k_dir (an empty dataset "
            "would initialize the full-size model and die much later)"
        )
    cfg = config_from_args(args)

    # Guard against remote-Mosaic compile hangs (ops/pallas_guard.py):
    # probes every enabled Pallas kernel at the EXACT shapes this config
    # will compile and downgrades to XLA on timeout/failure.
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    cfg = guard_config(cfg)

    if args.debug_nans:
        from diffusion_image_captioning_tpu.utils.profiling import debug_nans

        debug_nans(True)

    from diffusion_image_captioning_tpu.pipeline import run_flickr_training
    from diffusion_image_captioning_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        _, history, bleu = run_flickr_training(
            cfg, args.flickr8k_dir, args.flickr30k_dir,
            out_dir=args.out_dir, assets_dir=args.assets_dir, seed=args.seed,
        )
    print(f"final BLEU-4: {bleu}")


if __name__ == "__main__":
    main()
