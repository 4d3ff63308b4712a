"""Flickr8k/30k caption + precomputed-CLIP-feature pipeline.

Reference behavior (CLIP-DDPM.py:123-221): four pickled CLIP feature tensors
(8k image/text, 30k image/text) are vstacked into one aligned table; captions
come from ``flickr8k/captions.txt`` (comma CSV: image,caption) and
``flickr30k/captions.csv`` ('|'-separated with image_name/caption columns);
row i of the caption table aligns with row i of the feature table; each item
is tokenized to fixed MAX_LENGTH.

Here the feature store is ``.npy``/``.npz`` (converted once from the torch
pickles via ``convert_torch_pickle`` — torch is only imported inside that
function), captions are read with the stdlib csv module, and the dataset is
one dict of dense arrays (data/batcher.py consumes it).
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from typing import Optional, Sequence

import numpy as np


def read_captions_csv(
    path: str,
    image_col: str = "image",
    caption_col: str = "caption",
    sep: str = ",",
) -> tuple[list[str], list[str]]:
    """Returns (image_names, captions), row-aligned. Flickr8k uses the
    defaults; Flickr30k uses sep='|', image_col='image_name'
    (CLIP-DDPM.py:209-210)."""
    images: list[str] = []
    captions: list[str] = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter=sep)
        # '|'-separated exports often pad header/cells with spaces.
        field_map = {name.strip(): name for name in reader.fieldnames or []}
        ic, cc = field_map.get(image_col, image_col), field_map.get(caption_col, caption_col)
        for row in reader:
            img, cap = row.get(ic), row.get(cc)
            if img is None or cap is None:
                continue
            images.append(img.strip())
            captions.append(cap)  # NOT stripped: the reference keeps the
            # '|'-export's padded cells verbatim (CLIP-DDPM.py:209),
            # and BLEU reference strings must match its bytes
    return images, captions


def convert_torch_pickle(pickle_path: str, out_path: str) -> str:
    """One-time conversion of the reference's torch feature pickles
    (CLIP-DDPM.py:123-126) to .npy. Torch (CPU) is imported lazily."""
    import torch  # local import: torch is only needed for this migration

    t = torch.load(pickle_path, map_location="cpu", weights_only=False)
    np.save(out_path, t.detach().numpy().astype(np.float32))
    return out_path


def load_features(path: str) -> np.ndarray:
    """Load a [n, clip_dim] float32 feature table from .npy/.npz (or fall
    back to a torch pickle for drop-in compatibility)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[z.files[0]].astype(np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return t.detach().numpy().astype(np.float32)


def make_flickr_dataset(
    image_names: Sequence[str],
    captions: Sequence[str],
    image_clip: np.ndarray,
    text_clip: np.ndarray,
    tokenizer,
    max_length: int,
) -> dict:
    """Dense columns for the batcher; the host-only 'caption'/'image' lists
    ride along for decoding and BLEU reference lookup
    (CLIP-DDPM.py:190-197)."""
    n = len(captions)
    if not (len(image_names) == image_clip.shape[0] == text_clip.shape[0] == n):
        raise ValueError(
            f"misaligned dataset: {n} captions, {len(image_names)} images, "
            f"{image_clip.shape[0]}/{text_clip.shape[0]} feature rows"
        )
    from diffusion_image_captioning_tpu.data.tokenizers import (
        WordPieceTokenizer,
    )

    if isinstance(tokenizer, WordPieceTokenizer):
        # batch path: the native C++ encoder (utils/native.py) when its
        # configuration matches, Python otherwise — identical ids either
        # way (parity-tested in tests/test_native.py)
        from diffusion_image_captioning_tpu.utils.native import encode_batch

        input_ids, mask = encode_batch(tokenizer, list(captions), max_length)
    else:
        input_ids = np.zeros((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, cap in enumerate(captions):
            input_ids[i], mask[i] = tokenizer.encode(cap, max_length)
    return {
        "input_ids": input_ids,
        "attention_mask": mask,
        "image_clip": np.asarray(image_clip, np.float32),
        "text_clip": np.asarray(text_clip, np.float32),
        "caption": list(captions),
        "image": list(image_names),
    }


def captions_by_image(image_names: Sequence[str], captions: Sequence[str]) -> dict:
    """image name -> all its GT captions (the pandas lookup at
    CLIP-DDPM.py:625-627)."""
    table: dict[str, list[str]] = defaultdict(list)
    for img, cap in zip(image_names, captions):
        table[img].append(cap)
    return dict(table)


def load_combined(
    flickr8k_dir: Optional[str] = None,
    flickr30k_dir: Optional[str] = None,
) -> tuple[list[str], list[str], np.ndarray, np.ndarray]:
    """The reference's vstack of 8k + 30k (CLIP-DDPM.py:127-128,209-210).
    Either dir may be None for a single-dataset run. Feature files are
    looked up as image_clip.npy / text_clip.npy in each dir (falling back to
    the reference pickle names)."""
    all_imgs: list[str] = []
    all_caps: list[str] = []
    img_feats: list[np.ndarray] = []
    txt_feats: list[np.ndarray] = []

    def feat(dirname: str, kind: str, legacy: str) -> np.ndarray:
        for cand in (os.path.join(dirname, f"{kind}.npy"), os.path.join(dirname, legacy)):
            if os.path.exists(cand):
                return load_features(cand)
        raise FileNotFoundError(f"no {kind} features under {dirname}")

    if flickr8k_dir:
        imgs, caps = read_captions_csv(os.path.join(flickr8k_dir, "captions.txt"))
        all_imgs += imgs
        all_caps += caps
        img_feats.append(feat(flickr8k_dir, "image_clip", "image_all_final.pickle"))
        txt_feats.append(feat(flickr8k_dir, "text_clip", "text_all_final.pickle"))
    if flickr30k_dir:
        imgs, caps = read_captions_csv(
            os.path.join(flickr30k_dir, "captions.csv"), image_col="image_name", sep="|"
        )
        all_imgs += imgs
        all_caps += caps
        img_feats.append(feat(flickr30k_dir, "image_clip", "flickr30k_clip_image.pickle"))
        txt_feats.append(feat(flickr30k_dir, "text_clip", "flickr30k_clip_text.pickle"))
    return (
        all_imgs,
        all_caps,
        np.vstack(img_feats) if img_feats else np.zeros((0, 512), np.float32),
        np.vstack(txt_feats) if txt_feats else np.zeros((0, 512), np.float32),
    )
