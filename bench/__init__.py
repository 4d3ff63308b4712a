"""Checked-in performance probes (docs/PERF.md records their results).

A package so bench.py can import the shared DP-projection implementation;
each probe is also directly runnable (python bench/<probe>.py).
"""


def synthetic_batch(cfg, seed: int = 0) -> dict:
    """The flagship synthetic bench batch — ONE recipe shared by bench.py
    and every probe (breakdown, batch_scaling, dp_projection,
    profile_step) so their numbers all measure the same inputs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    return {
        "input_ids": rng.integers(
            0, cfg.vocab_size, (B, cfg.max_length)
        ).astype(np.int32),
        "attention_mask": np.ones((B, cfg.max_length), np.int32),
        "image_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
    }
