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


_SUBJECTS = ["a dog", "a cat", "a man", "a woman", "a child", "two people",
             "a group of people", "a horse", "a bird", "a cyclist"]
_VERBS = ["running", "sitting", "jumping", "playing", "standing", "walking",
          "sleeping", "eating"]
_PLACES = ["on the grass", "at the beach", "in the park", "on the street",
           "near the water", "in the snow", "on a bench", "by a tree"]


def synthetic_correlated_captions(
    n_images: int, clip_dim: int = 512, seed: int = 0, axes_seed: int | None = None
):
    """A learnable captioning world: each image is a (subject, verb, place)
    triple; its "CLIP" feature is a fixed random embedding of the triple
    (plus small per-image noise), and its 5 captions are word-order
    paraphrases of the triple. A model that uses the image conditioning can
    predict the caption content — so val BLEU-4 meaningfully exceeds the
    unconditioned floor (unlike uniformly random captions).

    ``axes_seed`` (optional) seeds the per-axis embedding tables from a
    SEPARATE stream so two worlds with different ``seed`` can share one
    "CLIP space" — the combined Flickr8k+30k protocol needs both datasets'
    features to live in the same embedding geometry, like real CLIP.
    Default (None) keeps the original single-stream draw order, so archived
    correlated-world runs reproduce byte-identically."""
    rng = np.random.default_rng(seed)
    axes_rng = rng if axes_seed is None else np.random.default_rng(axes_seed)
    axes = {}
    for name, vocab in (("s", _SUBJECTS), ("v", _VERBS), ("p", _PLACES)):
        axes[name] = axes_rng.normal(size=(len(vocab), clip_dim)).astype(np.float32)

    imgs, caps, feats = [], [], []
    for i in range(n_images):
        si = int(rng.integers(len(_SUBJECTS)))
        vi = int(rng.integers(len(_VERBS)))
        pi = int(rng.integers(len(_PLACES)))
        f = (
            axes["s"][si] + axes["v"][vi] + axes["p"][pi]
            + 0.1 * rng.normal(size=clip_dim)
        ).astype(np.float32)
        f /= np.linalg.norm(f)
        s, v, p = _SUBJECTS[si], _VERBS[vi], _PLACES[pi]
        variants = [
            f"{s} {v} {p} .",
            f"{s} is {v} {p} .",
            f"{p} , {s} is {v} .",
            f"{s} {v} {p} today .",
            f"there is {s} {v} {p} .",
        ]
        for cap in variants:
            imgs.append(f"img_{i:05d}.jpg")
            caps.append(cap)
            feats.append(f)
    return imgs, caps, np.stack(feats)


def _world_cached(tmp_dir: str, captions_name: str, n_rows: int) -> bool:
    """True if tmp_dir already holds a complete world of n_rows rows —
    builders are deterministic in (n_images, seed), so segment restarts of
    long supervised runs can skip the ~minutes-scale regeneration."""
    import os

    cap = os.path.join(tmp_dir, captions_name)
    npy = os.path.join(tmp_dir, "image_clip.npy")
    txt = os.path.join(tmp_dir, "text_clip.npy")
    if not (os.path.exists(cap) and os.path.exists(npy) and os.path.exists(txt)):
        return False
    try:
        return (
            np.load(npy, mmap_mode="r").shape[0] == n_rows
            and np.load(txt, mmap_mode="r").shape[0] == n_rows
        )
    except Exception:  # noqa: BLE001 — torn write -> rebuild
        return False


def synthetic_correlated_flickr_dir(tmp_dir: str, n_images: int = 800, seed: int = 0) -> str:
    """Materialize the correlated world in flickr8k layout."""
    import os

    os.makedirs(tmp_dir, exist_ok=True)
    if _world_cached(tmp_dir, "captions.txt", n_images * 5):
        return tmp_dir
    imgs, caps, feats = synthetic_correlated_captions(n_images, seed=seed)
    with open(os.path.join(tmp_dir, "captions.txt"), "w") as f:
        f.write("image,caption\n")
        for img, cap in zip(imgs, caps):
            f.write(f'{img},"{cap}"\n')
    np.save(os.path.join(tmp_dir, "image_clip.npy"), feats)
    # text features: caption-side embedding = image feature (they encode
    # the same triple), small independent noise
    rng = np.random.default_rng(seed + 99)
    txt = feats + 0.05 * rng.normal(size=feats.shape).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    np.save(os.path.join(tmp_dir, "text_clip.npy"), txt)
    return tmp_dir


def synthetic_correlated_flickr30k_dir(
    tmp_dir: str, n_images: int = 2000, seed: int = 1000, axes_seed: int = 0
) -> str:
    """Materialize a correlated world in the REAL Flickr30k layout: a
    '|'-separated ``captions.csv`` with padded ``image_name| comment_number|
    caption`` cells (the Kaggle export format the reference loads at
    CLIP-DDPM.py:209-210) plus ``image_clip.npy``/``text_clip.npy``.

    Pass the 8k world's seed as ``axes_seed`` so both halves of a combined
    Flickr8k+30k-shape protocol share one CLIP embedding geometry while
    drawing disjoint images."""
    import os

    os.makedirs(tmp_dir, exist_ok=True)
    if _world_cached(tmp_dir, "captions.csv", n_images * 5):
        return tmp_dir
    imgs, caps, feats = synthetic_correlated_captions(
        n_images, seed=seed, axes_seed=axes_seed
    )
    with open(os.path.join(tmp_dir, "captions.csv"), "w") as f:
        f.write("image_name| comment_number| caption\n")
        for i, (img, cap) in enumerate(zip(imgs, caps)):
            # 30k image ids are numeric-ish and distinct from the 8k world's
            f.write(f"30k_{img}| {i % 5}| {cap}\n")
    np.save(os.path.join(tmp_dir, "image_clip.npy"), feats)
    rng = np.random.default_rng(seed + 99)
    txt = feats + 0.05 * rng.normal(size=feats.shape).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    np.save(os.path.join(tmp_dir, "text_clip.npy"), txt)
    return tmp_dir


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
    # rows of the SAME image share one image feature (like the real Flickr
    # table, where the per-image CLIP feature repeats across its ~5
    # caption rows); text features stay per-caption
    uniq = sorted(set(imgs), key=imgs.index)
    per_image = synthetic_clip_features(len(uniq), seed=seed + 1)
    img_index = {name: i for i, name in enumerate(uniq)}
    img_feats = per_image[[img_index[name] for name in imgs]]
    np.save(os.path.join(tmp_dir, "image_clip.npy"), img_feats)
    np.save(os.path.join(tmp_dir, "text_clip.npy"), synthetic_clip_features(n, seed=seed + 2))
    return tmp_dir
