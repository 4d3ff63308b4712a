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
    p.add_argument("--allow_random_clip", action="store_true",
                   help="smoke-test only: proceed with random CLIP weights")
    p.add_argument("--no_normalize", action="store_true",
                   help="skip L2 normalization of fresh features. The "
                        "reference's image pickles are RAW encoder outputs "
                        "(CLIP-DDPM.py:123 loads them unnormalized; only "
                        "COCO_BLEU.py:221 normalizes at eval) — pass this "
                        "when mixing fresh extraction with --convert output "
                        "so both sources share the same scale")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in "
                        "this image — a startup hook initializes TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

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

    from diffusion_image_captioning_tpu.pipeline import load_clip_vision_params

    imgs, caps = fl.read_captions_csv(args.captions)
    enc = CLIPVisionEncoder()
    params = load_clip_vision_params(
        enc, args.assets_dir, allow_random=args.allow_random_clip
    )

    @jax.jit
    def encode(p_, pix):
        # params as a traced argument (closure capture would constant-fold
        # the full weight tree into the jaxpr)
        return enc.apply(
            {"params": p_}, preprocess_images(pix),
            normalize=not args.no_normalize,
        )

    # captions CSVs are row-aligned (~5 rows per image): encode each UNIQUE
    # image once and scatter back with the inverse index
    uniq, inverse = np.unique(np.asarray(imgs), return_inverse=True)
    ufeats = np.zeros((len(uniq), 512), np.float32)
    B = args.batch_size
    for i in range(0, len(uniq), B):
        chunk = list(uniq[i : i + B])
        pix = load_image_batch(args.images_dir, chunk)
        pad = B - len(chunk)
        if pad:
            pix = np.concatenate([pix, np.zeros((pad, 224, 224, 3), np.uint8)])
        out = np.asarray(encode(params, jnp.asarray(pix)))
        ufeats[i : i + len(chunk)] = out[: len(chunk)]
        print(f"\r{i + len(chunk)}/{len(uniq)} unique images", end="", flush=True)
    feats = ufeats[inverse]
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
    def encode(p_, ids):
        return enc.apply({"params": p_}, ids, normalize=not args.no_normalize)

    feats = np.zeros((len(caps), 512), np.float32)
    B = args.batch_size
    for i in range(0, len(caps), B):
        chunk = caps[i : i + B]
        ids = tokenizer(chunk)
        pad = B - len(chunk)
        if pad:
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), np.int32)])
        out = np.asarray(encode(params, jnp.asarray(ids)))
        feats[i : i + len(chunk)] = out[: len(chunk)]
        print(f"\r{i + len(chunk)}/{len(caps)}", end="", flush=True)
    print()
    out_path = os.path.join(args.out_dir, "text_clip.npy")
    np.save(out_path, feats)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
