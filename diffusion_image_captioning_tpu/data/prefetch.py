"""Device prefetch for host-side batch iterators.

jax dispatch is asynchronous but argument TRANSFER happens at call time;
on a slow host (this image has one CPU core) the per-step Python + H2D
latency dominates a fast device step. ``prefetch_to_device`` keeps a small
window of upcoming batches already transferred (jax.device_put is async),
overlapping host work with device compute — the TPU-idiomatic stand-in for
the reference's torch DataLoader worker processes (CLIP-DDPM.py:220).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def device_put_batch(batch: dict, sharding=None) -> dict:
    """Transfer array-valued entries (async); pass metadata through."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            out[k] = jax.device_put(v, sharding) if sharding else jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_to_device(
    batches: Iterable[dict], size: int = 2, sharding=None
) -> Iterator[dict]:
    """Yield batches with ``size`` transfers in flight ahead of consumption."""
    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(device_put_batch(next(it), sharding))
    except StopIteration:
        pass
    while queue:
        nxt: Optional[dict] = None
        try:
            nxt = device_put_batch(next(it), sharding)
        except StopIteration:
            pass
        yield queue.popleft()
        if nxt is not None:
            queue.append(nxt)


class PrefetchingLoader:
    """Re-iterable wrapper: every epoch iterates the base loader through a
    fresh prefetch window (train.fit re-iterates per epoch)."""

    def __init__(self, base, size: int = 2, sharding=None):
        self.base = base
        self.size = size
        self.sharding = sharding

    def __len__(self):
        return len(self.base)

    def __iter__(self):
        return prefetch_to_device(self.base, self.size, self.sharding)
