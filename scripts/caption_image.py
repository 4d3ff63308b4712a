#!/usr/bin/env python
"""Zero-shot captioning of a local image — the notebook's cell-24 demo as a
CLI: CLIP-encode the image on device, refine pure noise K times, decode.

    python scripts/caption_image.py photo.jpg CKPT_NAME --ckpt_dir runs/ \
        --assets_dir ./assets --steps 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("ckpt_name")
    p.add_argument("--ckpt_dir", default=".")
    p.add_argument("--assets_dir", default=None)
    p.add_argument("--captions", default=None,
                   help="training captions CSV, to rebuild the tokenizer "
                        "when assets_dir/vocab.txt is absent or the model "
                        "used train_embedding")
    p.add_argument("--allow_random_clip", action="store_true",
                   help="smoke-test only: proceed with random CLIP weights")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in "
                        "this image — a startup hook initializes TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from diffusion_image_captioning_tpu import checkpoint as ck
    from diffusion_image_captioning_tpu import sample
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.data.coco import load_image_batch
    from diffusion_image_captioning_tpu.models.clip import (
        CLIPVisionEncoder,
        preprocess_images,
    )
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.pipeline import (
        build_eval_tokenizer,
        load_clip_vision_params,
    )

    state, cfg, _ = ck.restore(args.ckpt_name, args.ckpt_dir)
    # Guard against remote-Mosaic compile hangs (ops/pallas_guard.py):
    # probes every enabled Pallas kernel at the EXACT shapes this config
    # will compile and downgrades to XLA on timeout/failure.
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    cfg = guard_config(cfg)
    model, _ = init_denoiser(cfg, jax.random.PRNGKey(0))
    params = tr.merge_params(state.trainable, state.frozen)
    tokenizer = build_eval_tokenizer(cfg, args.assets_dir, args.captions)

    enc = CLIPVisionEncoder()
    clip_params = load_clip_vision_params(
        enc, args.assets_dir, allow_random=args.allow_random_clip
    )

    pix = load_image_batch(
        os.path.dirname(args.image) or ".", [os.path.basename(args.image)]
    )
    feats = enc.apply({"params": clip_params}, preprocess_images(jnp.asarray(pix)))
    ids = sample.sample_caption_ids(
        model, cfg, params, feats, jax.random.PRNGKey(args.seed), steps=args.steps
    )  # argmax on device: ships [B, L] ids, not [B, L, V] logits
    for row in sample.dedup_consecutive(ids):
        print(tokenizer.decode(row))


if __name__ == "__main__":
    main()
