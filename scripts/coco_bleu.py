#!/usr/bin/env python
"""Zero-shot COCO BLEU-4 evaluator — the COCO_BLEU.py program as a command,
with batched ON-DEVICE CLIP image encoding replacing the reference's
per-item host CLIP calls (COCO_BLEU.py:217-226).

    python scripts/coco_bleu.py CKPT_NAME --coco_root ./coco_2014_caption/val2014 \
        --ann_file ./coco_2014_caption/val2014_caption.json --assets_dir ./assets

The positional argument is the run name; like the reference (:237) it must
match the checkpoint's config codec name.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_name")
    p.add_argument("--ckpt_dir", default=".")
    p.add_argument("--coco_root", required=True)
    p.add_argument("--ann_file", required=True)
    p.add_argument("--assets_dir", default=None)
    p.add_argument("--captions", default=None,
                   help="training captions CSV, to rebuild the tokenizer "
                        "when assets_dir/vocab.txt is absent or the model "
                        "used train_embedding")
    p.add_argument("--allow_random_clip", action="store_true",
                   help="smoke-test only: proceed with random CLIP weights")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--limit", type=int, default=1000)
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
    import numpy as np

    from diffusion_image_captioning_tpu import checkpoint as ck
    from diffusion_image_captioning_tpu import eval_bleu, sample
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.config import model_name
    from diffusion_image_captioning_tpu.data import coco
    from diffusion_image_captioning_tpu.models.clip import (
        CLIPVisionEncoder,
        preprocess_images,
    )
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.models.hf_convert import convert_clip_vision
    from diffusion_image_captioning_tpu.pipeline import (
        build_eval_tokenizer,
        load_clip_vision_params,
    )

    state, cfg, _ = ck.restore(args.ckpt_name, args.ckpt_dir)
    # checkpoint-name guard (COCO_BLEU.py:237)
    assert args.ckpt_name == model_name(cfg), (
        f"checkpoint name {args.ckpt_name!r} != config codec {model_name(cfg)!r}"
    )
    # Guard against remote-Mosaic compile hangs (ops/pallas_guard.py):
    # probes every enabled Pallas kernel at the EXACT shapes this config
    # will compile and downgrades to XLA on timeout/failure.
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    cfg = guard_config(cfg)
    model, _ = init_denoiser(cfg, jax.random.PRNGKey(0))
    params = tr.merge_params(state.trainable, state.frozen)
    tokenizer = build_eval_tokenizer(cfg, args.assets_dir, args.captions)

    clip_enc = CLIPVisionEncoder()
    clip_params = load_clip_vision_params(
        clip_enc, args.assets_dir, allow_random=args.allow_random_clip
    )

    @jax.jit
    def encode(cp, pixels_u8):
        # params as a traced ARGUMENT: closure capture would bake ~350 MB
        # of fp32 weights into the jaxpr as constants
        return clip_enc.apply({"params": cp}, preprocess_images(pixels_u8))

    key = jax.random.PRNGKey(args.seed)
    acc, n_images = 0.0, 0
    for batch in coco.iter_coco_batches(
        args.coco_root, args.ann_file, args.batch_size, limit=args.limit
    ):
        feats = encode(clip_params, jnp.asarray(batch["pixels"]))
        key, k = jax.random.split(key)
        ids = sample.sample_caption_ids(
            model, cfg, params, feats, k, steps=cfg.refine_steps_eval
        )  # argmax on device: ships [B, L] ids, not [B, L, V] logits
        for row, caps in zip(
            sample.dedup_consecutive(ids), batch["captions"]
        ):
            cand = eval_bleu.coco_candidate_tokens(
                tokenizer.decode(row), cfg.max_length
            )
            refs = eval_bleu.coco_reference_tokens(caps, cfg.max_length)
            acc += eval_bleu.bleu_corpus([cand], [refs])
            n_images += 1

    # True-count divisor (COCO_BLEU.py:265-268 protocol): the zero-padded
    # ragged tail rows are never scored — surface the count so callers
    # (and tests) can verify it matches the annotation set, not the padded
    # batch total.
    print(f"[coco] scored {n_images} images", file=sys.stderr)
    print(acc / max(n_images, 1))


if __name__ == "__main__":
    main()
