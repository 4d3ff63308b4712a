"""Synthetic datasets for hermetic verification and benchmarks.

No network, no external files: generates caption-like text from a small
vocabulary plus random unit-norm "CLIP" features, shaped exactly like the
Flickr pipeline's columns (data/flickr.py). Used by tests and by verify
drives; also handy for compile-warming on TPU.
"""

from __future__ import annotations

import numpy as np

_WORDS = (
    "a the young man woman dog cat child girl boy red blue green large small "
    "running jumping sitting standing playing holding wearing riding walking "
    "on in at near beside street park beach grass water snow ball stick shirt "
    "hat group two three people crowd smiling looking"
).split()


def synthetic_captions(n: int, seed: int = 0, min_len: int = 4, max_len: int = 12):
    """n caption strings + n image names (5 captions share one image, like
    Flickr's 5-captions-per-image layout)."""
    rng = np.random.default_rng(seed)
    caps = []
    imgs = []
    for i in range(n):
        k = int(rng.integers(min_len, max_len + 1))
        words = rng.choice(_WORDS, size=k)
        caps.append(" ".join(words) + " .")
        imgs.append(f"img_{i // 5:05d}.jpg")
    return imgs, caps


def synthetic_clip_features(n: int, dim: int = 512, seed: int = 1) -> np.ndarray:
    """[n, dim] float32, L2-normalized rows (CLIP features are unit-norm)."""
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(n, dim)).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def synthetic_flickr_dirs(tmp_dir: str, n: int = 100, seed: int = 0) -> str:
    """Materialize a flickr8k-layout directory (captions.txt + feature .npy)
    under tmp_dir for driving the full file-based pipeline."""
    import os

    os.makedirs(tmp_dir, exist_ok=True)
    imgs, caps = synthetic_captions(n, seed)
    with open(os.path.join(tmp_dir, "captions.txt"), "w") as f:
        f.write("image,caption\n")
        for img, cap in zip(imgs, caps):
            f.write(f'{img},"{cap}"\n')
    np.save(os.path.join(tmp_dir, "image_clip.npy"), synthetic_clip_features(n, seed=seed + 1))
    np.save(os.path.join(tmp_dir, "text_clip.npy"), synthetic_clip_features(n, seed=seed + 2))
    return tmp_dir
