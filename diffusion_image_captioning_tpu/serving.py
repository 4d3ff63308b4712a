"""Batched caption serving — the production-inference layer.

The reference has no serving story: its zero-shot path captions ONE image
per Python iteration with a fresh model application each time
(COCO_BLEU.py:246-253, CLIP-DDPM.ipynb cell 24). On TPU that wastes the
chip: a batch-1 refinement step costs nearly the same wall time as a
batch-64 one (docs/PERF.md: 7.1 ms for 64 captions at 5 steps), so a
server must aggregate concurrent requests into one device call.

``CaptionService`` does exactly that:

  * ONE jitted sampler, compiled once at a fixed ``max_batch`` — requests
    are padded into the static shape (XLA never recompiles after warmup);
  * a micro-batching worker thread: the first pending request opens a
    window of ``max_wait_ms``; everything that arrives in the window (up
    to ``max_batch``) rides the same device call;
  * per-request determinism: each request's initial noise is drawn on
    device from its OWN seed (one PRNG stream per row), so the caption
    for (features, seed) is independent of batch composition (rows never
    interact in the denoiser: attention is per-sequence, dropout is off
    at eval);
  * all device work stays on the single worker thread — handlers only
    enqueue and wait.

The HTTP front-end lives in ``scripts/serve_captions.py``; this module is
dependency-free (stdlib + the framework) and unit-tested on CPU
(tests/test_serving.py).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np


@dataclass
class _Pending:
    features: np.ndarray          # [clip_dim] fp32
    seed: int
    event: threading.Event = field(default_factory=threading.Event)
    caption: Optional[str] = None
    error: Optional[BaseException] = None


class CaptionService:
    """Micro-batching caption sampler around one jitted refinement loop.

    Parameters
    ----------
    model, cfg, params : the denoiser triple (as in sample.sample_captions).
    tokenizer : anything with ``decode(ids) -> str`` (the training
        tokenizer rebuilt by ``pipeline.build_eval_tokenizer``).
    max_batch : static device batch; requests pad into it.
    max_wait_ms : how long the worker holds the window open after the
        first request before launching a partial batch.
    steps : refinement applications per caption (reference eval uses 5).
    """

    def __init__(
        self,
        model,
        cfg,
        params,
        tokenizer,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        steps: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp

        from diffusion_image_captioning_tpu import sample as _sample

        self._cfg = cfg
        # Device-resident once: a template-less checkpoint restore returns
        # HOST (numpy) leaves (checkpoint.save portability contract), and
        # feeding those to jit re-uploads every weight on every batch.
        self._params = jax.device_put(params)
        self._tokenizer = tokenizer
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._steps = int(cfg.refine_steps_eval if steps is None else steps)
        self._dedup = _sample.dedup_consecutive

        @jax.jit
        def _run(params, seeds, clip):
            # Initial noise ON DEVICE, one PRNG stream per request seed —
            # generating 64x[L, C] normals with host numpy measured
            # ~40 ms/batch on the single CPU core. Still a pure function
            # of the request seed (batch-composition independent).
            x0 = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.PRNGKey(s),
                    (cfg.max_length, cfg.in_channel),
                    jnp.float32,
                )
            )(seeds)
            logits, _, _ = _sample.refine(
                model, cfg, params, x0, clip, steps=self._steps
            )
            # argmax ON DEVICE: shipping [B, L, V] logits to host costs
            # ~125 MB/batch at flagship shapes (measured 10 captions/s);
            # the [B, L] int32 ids are 4 KB. softmax().argmax() ==
            # argmax(logits) (sample.greedy_decode_ids docstring).
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._fn = _run
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # stats
        self._lock = threading.Lock()
        self.n_batches = 0
        self.n_rows = 0

    # -- lifecycle ----------------------------------------------------------

    def start(self, warmup: bool = True) -> "CaptionService":
        if self._thread is not None:
            # A live (or undead — see stop()) worker sharing the queue
            # with a second one would mean two threads issuing concurrent
            # device calls: the exact multi-client condition that wedges
            # the remote chip (CLAUDE.md). Refuse rather than race.
            raise RuntimeError(
                "CaptionService already has a worker (start() called "
                "twice, or a previous stop() timed out mid-device-call); "
                "create a fresh service instead"
            )
        if warmup:
            self._launch(
                np.zeros((1, self._cfg.clip_dim), np.float32), [0]
            )  # compile before serving
            with self._lock:
                self.n_batches = self.n_rows = 0
        self._stop.clear()  # support stop() -> start() restart
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        # _stop is set under the same lock that _enqueue checks it under,
        # so every queue.put either preceded this point (and is drained
        # below) or raises in _enqueue — no request can be stranded.
        with self._lock:
            self._stop.set()
        wedged = False
        if self._thread is not None:
            self._thread.join(timeout=30)
            if self._thread.is_alive():
                # The worker is stuck in a device call (wedged tunnel).
                # Keep the handle so a later start() refuses to spawn a
                # second worker next to it (concurrent device clients
                # wedge the remote chip, CLAUDE.md).
                wedged = True
            else:
                self._thread = None
        # Drain abandoned requests: a submit() racing the shutdown must
        # error out, not block forever on its event.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            item.error = RuntimeError("CaptionService stopped")
            item.event.set()
        if wedged:
            raise RuntimeError(
                "CaptionService worker did not exit within 30s "
                "(wedged device call?); service is NOT restartable"
            )

    def _enqueue(self, item: _Pending) -> None:
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("CaptionService stopped")
            self._queue.put(item)

    # -- client API ---------------------------------------------------------

    def submit(self, features: np.ndarray, seed: int = 0,
               timeout: Optional[float] = None) -> str:
        """Block until the caption for one [clip_dim] feature vector is
        ready. Thread-safe; callers from many threads share batches."""
        feats = np.asarray(features, np.float32).reshape(-1)
        if feats.shape[0] != self._cfg.clip_dim:
            raise ValueError(
                f"features must have {self._cfg.clip_dim} dims, "
                f"got {feats.shape[0]}"
            )
        item = _Pending(feats, int(seed))
        self._enqueue(item)
        if not item.event.wait(timeout):
            raise TimeoutError("caption request timed out")
        if item.error is not None:
            raise item.error
        assert item.caption is not None
        return item.caption

    def submit_many(self, features: np.ndarray,
                    seeds: Optional[Sequence[int]] = None,
                    timeout: Optional[float] = None) -> List[str]:
        """Enqueue K rows through the micro-batcher and wait for all of
        them. Unlike caption_batch this keeps ALL device work on the
        worker thread and lets concurrent callers share batches."""
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self._cfg.clip_dim:
            raise ValueError(f"expected [K, {self._cfg.clip_dim}] features")
        seeds = list(seeds) if seeds is not None else list(range(len(feats)))
        if len(seeds) != len(feats):
            raise ValueError("seeds length must match features rows")
        items = [_Pending(f, int(s)) for f, s in zip(feats, seeds)]
        for it in items:
            self._enqueue(it)
        out: List[str] = []
        for it in items:
            if not it.event.wait(timeout):
                raise TimeoutError("caption request timed out")
            if it.error is not None:
                raise it.error
            assert it.caption is not None
            out.append(it.caption)
        return out

    def caption_batch(self, features: np.ndarray,
                      seeds: Optional[Sequence[int]] = None) -> List[str]:
        """Synchronous OFFLINE path: caption [K, clip_dim] rows with direct
        device calls on the caller's thread, chunked into max_batch. Meant
        for batch jobs / tests without the worker running; a live server
        should route through submit/submit_many so the single-worker-thread
        contract and batch aggregation hold."""
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self._cfg.clip_dim:
            raise ValueError(f"expected [K, {self._cfg.clip_dim}] features")
        seeds = list(seeds) if seeds is not None else list(range(len(feats)))
        if len(seeds) != len(feats):
            raise ValueError("seeds length must match features rows")
        out: List[str] = []
        for i in range(0, len(feats), self.max_batch):
            out.extend(
                self._launch(feats[i : i + self.max_batch],
                             seeds[i : i + self.max_batch])
            )
        return out

    def stats(self) -> dict:
        with self._lock:
            return {
                "batches": self.n_batches,
                "rows": self.n_rows,
                "mean_batch_occupancy": (
                    self.n_rows / self.n_batches if self.n_batches else 0.0
                ),
                "max_batch": self.max_batch,
                "steps": self._steps,
            }

    # -- worker -------------------------------------------------------------

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            feats = np.stack([p.features for p in batch])
            try:
                captions = self._launch(feats, [p.seed for p in batch])
                for p, c in zip(batch, captions):
                    p.caption = c
            except BaseException as e:  # propagate to every waiter
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.event.set()

    def _launch(self, feats: np.ndarray, seeds: Sequence[int]) -> List[str]:
        """Pad [k<=max_batch] rows into the static shape, run, decode."""
        cfg = self._cfg
        k = feats.shape[0]
        # Per-request seeds ride to the device; noise is drawn there.
        seed_arr = np.zeros((self.max_batch,), np.uint32)
        seed_arr[:k] = np.asarray(seeds, np.int64).astype(np.uint32)
        clip = np.zeros((self.max_batch, cfg.clip_dim), np.float32)
        clip[:k] = feats
        ids = self._dedup(
            np.asarray(self._fn(self._params, seed_arr, clip))[:k]
        )
        with self._lock:
            self.n_batches += 1
            self.n_rows += k
        return [self._tokenizer.decode(row) for row in ids]
