"""Fixed-shape host-side batching with resumable splits.

Replaces the reference's DataLoader + random_split (CLIP-DDPM.py:218-221):
  * 0.8/0.2 (configurable) split by a saved index permutation, so
    CONTINUE_TRAIN restores the exact same validation set
    (CLIP-DDPM.py:214-216) — here the permutation itself is the artifact.
  * shuffled train batches with drop_last=True semantics; deterministic
    sequential val batches, also drop_last (CLIP-DDPM.py:220-221).
  * every batch is a dict of dense numpy arrays of identical shape — one XLA
    compilation for the whole run.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def split_indices(
    n: int, train_ratio: float, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Random permutation split; returns (train_idx, val_idx)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = int(n * train_ratio)
    return perm[:k], perm[k:]


class Batcher:
    """Iterates dict-of-arrays columns in fixed-size batches.

    columns: dict name -> np.ndarray with leading axis n. Non-array metadata
    (python lists, e.g. raw caption strings) is sliced alongside and returned
    under the same key — host-only fields for decode/BLEU.
    """

    def __init__(
        self,
        columns: dict,
        indices: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
    ):
        self.columns = columns
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def advance_epochs(self, k: int) -> None:
        """Advance the shuffle stream past k epochs' permutations.

        A schedule-correct continue_train segment (config.py
        schedule_offset_epochs) must see the SAME epoch-k shuffle order a
        monolithic run would — np.random.Generator.permutation consumes a
        draw count that depends only on len(indices), so drawing and
        discarding k permutations replays the stream exactly.
        """
        for _ in range(max(k, 0) if self.shuffle else 0):
            self._rng.permutation(len(self.indices))

    def __len__(self) -> int:
        # Always drop-last — exact reference parity (BOTH its loaders pass
        # drop_last=True, CLIP-DDPM.py:220-221) and the static-shape
        # requirement agree: a ragged final batch would trigger a second
        # XLA compilation and skew the per-batch loss normalization.
        return len(self.indices) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = self.indices
        if self.shuffle:
            order = self._rng.permutation(order)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            out = {}
            for key, col in self.columns.items():
                if isinstance(col, np.ndarray):
                    out[key] = col[idx]
                else:
                    out[key] = [col[i] for i in idx]
            yield out
