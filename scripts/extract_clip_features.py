#!/usr/bin/env python
"""One-time CLIP feature extraction for Flickr images — builds the
image_clip.npy / text_clip.npy caches that data/flickr.py consumes
(replacing the reference's externally downloaded pickles,
CLIP-DDPM.py:123-126), with the ViT encode batched on device.

Also converts existing reference-format torch pickles with --convert, and
extracts the train-time text CLIP features (--texts) with the on-device
CLIP text tower + clean-room BPE tokenizer.

    python scripts/extract_clip_features.py --images_dir ./flickr8k/Images \
        --captions ./flickr8k/captions.txt --out_dir ./flickr8k
    python scripts/extract_clip_features.py --texts \
        --captions ./flickr8k/captions.txt --out_dir ./flickr8k \
        --assets_dir ./assets   # needs openai/clip-vit-base-patch32-local
    python scripts/extract_clip_features.py --convert ./flickr8k/image_all_final.pickle \
        --out ./flickr8k/image_clip.npy
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--convert", default=None, help="torch pickle to convert")
    p.add_argument("--out", default=None)
    p.add_argument("--images_dir", default=None)
    p.add_argument("--captions", default=None)
    p.add_argument(
        "--texts", action="store_true",
        help="extract text CLIP features for the caption strings",
    )
    p.add_argument("--out_dir", default=".")
    p.add_argument("--assets_dir", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()

    from diffusion_image_captioning_tpu.data import flickr as fl

    if args.convert:
        out = args.out or os.path.splitext(args.convert)[0] + ".npy"
        fl.convert_torch_pickle(args.convert, out)
        print(f"converted {args.convert} -> {out}")
        return

    if args.texts:
        if not args.captions:
            p.error("--texts needs --captions")
        _extract_texts(args)
        return

    if not (args.images_dir and args.captions):
        p.error("need either --convert, --texts, or (--images_dir and --captions)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_image_captioning_tpu.data.coco import load_image_batch
    from diffusion_image_captioning_tpu.models.clip import (
        CLIPVisionEncoder,
        preprocess_images,
    )
    from diffusion_image_captioning_tpu.models.hf_convert import (
        apply_flat_updates,
        convert_clip_vision,
    )

    imgs, caps = fl.read_captions_csv(args.captions)
    enc = CLIPVisionEncoder()
    params = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    clip_dir = args.assets_dir and os.path.join(
        args.assets_dir, "openai", "clip-vit-base-patch32-local"
    )
    if clip_dir and os.path.isdir(clip_dir):
        params = apply_flat_updates(params, convert_clip_vision(clip_dir))

    @jax.jit
    def encode(pix):
        return enc.apply({"params": params}, preprocess_images(pix))

    feats = np.zeros((len(imgs), 512), np.float32)
    B = args.batch_size
    for i in range(0, len(imgs), B):
        chunk = imgs[i : i + B]
        pix = load_image_batch(args.images_dir, chunk)
        pad = B - len(chunk)
        if pad:
            pix = np.concatenate([pix, np.zeros((pad, 224, 224, 3), np.uint8)])
        out = np.asarray(encode(jnp.asarray(pix)))
        feats[i : i + len(chunk)] = out[: len(chunk)]
        print(f"\r{i + len(chunk)}/{len(imgs)}", end="", flush=True)
    print()
    out_path = os.path.join(args.out_dir, "image_clip.npy")
    np.save(out_path, feats)
    print(f"wrote {out_path}")


def _extract_texts(args) -> None:
    """Caption strings -> text_clip.npy via the on-device CLIP text tower
    (replaces the reference's externally produced text_all_final.pickle)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_image_captioning_tpu.data import flickr as fl
    from diffusion_image_captioning_tpu.data import clip_bpe
    from diffusion_image_captioning_tpu.models.clip import CLIPTextEncoder
    from diffusion_image_captioning_tpu.models.hf_convert import (
        apply_flat_updates,
        convert_clip_text,
    )

    clip_dir = args.assets_dir and os.path.join(
        args.assets_dir, "openai", "clip-vit-base-patch32-local"
    )
    if not (clip_dir and os.path.isdir(clip_dir)):
        raise SystemExit(
            "--texts needs --assets_dir with openai/clip-vit-base-patch32-local "
            "(vocab.json + merges.txt + weights); random text features would "
            "poison the train-time conditioning"
        )
    tokenizer = clip_bpe.from_hf_dir(clip_dir)

    _, caps = fl.read_captions_csv(args.captions)
    enc = CLIPTextEncoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
    params = apply_flat_updates(params, convert_clip_text(clip_dir))

    @jax.jit
    def encode(ids):
        return enc.apply({"params": params}, ids)

    feats = np.zeros((len(caps), 512), np.float32)
    B = args.batch_size
    for i in range(0, len(caps), B):
        chunk = caps[i : i + B]
        ids = tokenizer(chunk)
        pad = B - len(chunk)
        if pad:
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), np.int32)])
        out = np.asarray(encode(jnp.asarray(ids)))
        feats[i : i + len(chunk)] = out[: len(chunk)]
        print(f"\r{i + len(chunk)}/{len(caps)}", end="", flush=True)
    print()
    out_path = os.path.join(args.out_dir, "text_clip.npy")
    np.save(out_path, feats)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
