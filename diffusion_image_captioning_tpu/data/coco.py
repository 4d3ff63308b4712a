"""COCO val2014 zero-shot evaluation data.

The reference wraps torchvision CocoDetection and runs HF CLIP once per
image on the host CPU inside __getitem__ (COCO_BLEU.py:203-226) — the
slowest possible arrangement. Here: a dependency-free COCO caption-JSON
reader plus a *batched, on-device* CLIP encode using models/clip.py
(BASELINE.json north-star config #5).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np


def read_coco_captions(ann_file: str) -> tuple[list[dict], dict[int, list[str]]]:
    """Parse a COCO captions annotation JSON. Returns (images, captions_by
    image id). images entries: {"id", "file_name"}."""
    with open(ann_file, encoding="utf-8") as f:
        ann = json.load(f)
    caps: dict[int, list[str]] = {}
    for a in ann.get("annotations", []):
        caps.setdefault(a["image_id"], []).append(a["caption"])
    images = [
        {"id": im["id"], "file_name": im["file_name"]} for im in ann.get("images", [])
    ]
    return images, caps


def load_image_batch(
    root: str, file_names: list[str], size: int = 224
) -> np.ndarray:
    """[B, size, size, 3] uint8, center-cropped after resize-shortest-side —
    CLIP's preprocessing geometry (CLIPProcessor default)."""
    from PIL import Image  # lazy; PIL ships with the environment

    out = np.zeros((len(file_names), size, size, 3), np.uint8)
    for i, fn in enumerate(file_names):
        img = Image.open(os.path.join(root, fn)).convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        out[i] = np.asarray(img.crop((left, top, left + size, top + size)))
    return out


def iter_coco_batches(
    root: str,
    ann_file: str,
    batch_size: int,
    limit: Optional[int] = None,
) -> Iterator[dict]:
    """Yields {"pixels" [B,224,224,3] u8, "captions" list[list[str]]}.
    ``limit`` mirrors COCO_BLEU.py:265's 1000-image cap. The ragged tail is
    ZERO-PADDED to the static batch shape (captions list stays at the true
    length, so consumers score exactly len(captions) images — dropping the
    tail would deviate from the reference's fixed 1000-image protocol)."""
    import numpy as np

    images, caps = read_coco_captions(ann_file)
    if limit is not None:
        images = images[:limit]
    for i in range(0, len(images), batch_size):
        chunk = images[i : i + batch_size]
        pixels = load_image_batch(root, [c["file_name"] for c in chunk])
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            pixels = np.concatenate(
                [pixels, np.zeros((pad,) + pixels.shape[1:], pixels.dtype)]
            )
        yield {
            "pixels": pixels,
            "captions": [caps.get(c["id"], [""]) for c in chunk],
        }
