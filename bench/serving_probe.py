#!/usr/bin/env python
"""Serving-layer throughput probe (full-size model, one TPU chip).

Measures serving.CaptionService end to end — padding, refinement scan,
host decode, micro-batching — at the flagship model size with a full
30522-entry vocab tokenizer (random init; throughput is weight-agnostic):

  * offline: caption_batch over K rows chunked at max_batch (the batch-job
    path) -> captions/s;
  * online: N concurrent submitters pushing single requests through the
    worker window -> captions/s + mean batch occupancy.

Run: python bench/serving_probe.py [--max_batch 64] [--steps 5]
Numbers recorded in docs/PERF.md ("Serving throughput").
"""

import argparse
import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--rows", type=int, default=512)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--online_requests", type=int, default=256)
    args = p.parse_args()

    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.data.tokenizers import WordPieceTokenizer
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config
    from diffusion_image_captioning_tpu.serving import CaptionService

    cfg = Config(compute_dtype="bfloat16")
    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    if on_tpu:
        cfg = guard_config(cfg)
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))

    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    vocab = {s: i for i, s in enumerate(specials)}
    for i in range(len(specials), cfg.vocab_size):
        vocab[f"tok{i}"] = i
    svc = CaptionService(
        model, cfg, params, WordPieceTokenizer(vocab),
        max_batch=args.max_batch, max_wait_ms=5.0, steps=args.steps,
    )
    svc.start()  # warmup compiles here
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((args.rows, cfg.clip_dim)).astype(np.float32)

    # offline path
    svc.caption_batch(feats[: args.max_batch])  # steady-state warm
    t0 = time.perf_counter()
    caps = svc.caption_batch(feats)
    dt_off = time.perf_counter() - t0
    assert len(caps) == args.rows

    # online, open-loop: ONE feeder enqueues every request up front (no
    # device work on the caller thread), then waits — the arrival stream is
    # decoupled from client-thread count, so this measures the SERVICE's
    # sustainable capacity. The closed-loop leg below (N blocking clients)
    # measures a latency-bound harness instead: with 8 threads sharing this
    # host's ONE core, occupancy caps at 8/max_batch and the number reports
    # the harness, not the service (round-2 VERDICT item 8).
    base = svc.stats()
    t0 = time.perf_counter()
    svc.submit_many(
        feats[np.arange(args.online_requests) % args.rows],
        seeds=range(args.online_requests),
        timeout=300,
    )
    dt_open = time.perf_counter() - t0
    s_open = svc.stats()
    b_open = s_open["batches"] - base["batches"]
    occ_open = (s_open["rows"] - base["rows"]) / max(b_open, 1)

    # online, closed-loop (kept for comparison): N concurrent single submits
    base = svc.stats()
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
        list(
            ex.map(
                lambda i: svc.submit(feats[i % args.rows], seed=i, timeout=120),
                range(args.online_requests),
            )
        )
    dt_on = time.perf_counter() - t0
    stats = svc.stats()
    batches = stats["batches"] - base["batches"]
    occ = (stats["rows"] - base["rows"]) / max(batches, 1)
    svc.stop()

    print(
        f"offline: {args.rows} captions in {dt_off:.3f} s "
        f"= {args.rows / dt_off:.0f} captions/s "
        f"(max_batch {args.max_batch}, steps {args.steps})"
    )
    print(
        f"online open-loop (capacity): {args.online_requests} requests in "
        f"{dt_open:.3f} s = {args.online_requests / dt_open:.0f} captions/s, "
        f"{b_open} device batches, mean occupancy {occ_open:.1f}"
    )
    print(
        f"online closed-loop ({args.clients} blocking clients, "
        f"latency-bound harness): {args.online_requests} requests "
        f"in {dt_on:.3f} s = {args.online_requests / dt_on:.0f} captions/s, "
        f"{batches} device batches, mean occupancy {occ:.1f}"
    )


if __name__ == "__main__":
    main()
