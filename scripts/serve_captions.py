#!/usr/bin/env python
"""Batched caption server — production-inference front-end.

Serves a trained checkpoint over HTTP (stdlib only), aggregating concurrent
requests into single device calls via ``serving.CaptionService`` (one jitted
static-shape sampler; see that module's docstring). The reference has no
serving path — its closest analogue captions one image per Python loop
iteration (COCO_BLEU.py:246-253).

    python scripts/serve_captions.py RUN_NAME --ckpt_dir runs/ \
        --assets_dir assets --port 8491 --max_batch 64 --steps 5

Endpoints (JSON in/out):
  GET  /healthz            -> {"status": "ok", "run": ..., "stats": {...}}
  POST /caption            body {"features": [[...clip_dim floats...], ...],
                                 "seeds": [int, ...]?}
                           -> {"captions": [...]}
  POST /caption_image      body {"paths": ["/abs/or/rel.jpg", ...]}
                           (requires CLIP assets; --allow_random_clip for
                           smoke tests) -> {"captions": [...]}

Per-request determinism: the caption for (features, seed) does not depend
on what else rode the same batch.
"""

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_service(args):
    import jax

    from diffusion_image_captioning_tpu import checkpoint as ck
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config
    from diffusion_image_captioning_tpu.pipeline import build_eval_tokenizer
    from diffusion_image_captioning_tpu.serving import CaptionService

    state, cfg, _ = ck.restore(args.ckpt_name, args.ckpt_dir)
    cfg = guard_config(cfg)
    model, _ = init_denoiser(cfg, jax.random.PRNGKey(0))
    params = tr.merge_params(state.trainable, state.frozen)
    tokenizer = build_eval_tokenizer(cfg, args.assets_dir, args.captions)
    service = CaptionService(
        model, cfg, params, tokenizer,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        steps=args.steps,
    )
    return service, cfg


def build_image_encoder(args):
    """CLIP image -> feature closure (device call under a lock), or None."""
    clip_dir = args.assets_dir and os.path.join(
        args.assets_dir, "openai", "clip-vit-base-patch32-local"
    )
    if not (clip_dir and os.path.isdir(clip_dir)) and not args.allow_random_clip:
        # No assets and no explicit smoke-test override: skip the (slow)
        # ViT init entirely; /caption_image will report 503.
        return None

    import jax.numpy as jnp

    from diffusion_image_captioning_tpu.data.coco import load_image_batch
    from diffusion_image_captioning_tpu.models.clip import (
        CLIPVisionEncoder,
        preprocess_images,
    )
    from diffusion_image_captioning_tpu.pipeline import load_clip_vision_params

    enc = CLIPVisionEncoder()
    try:
        clip_params = load_clip_vision_params(
            enc, args.assets_dir, allow_random=args.allow_random_clip
        )
    except SystemExit:
        return None  # /caption_image will report 503
    lock = threading.Lock()

    def encode(paths):
        import numpy as np

        pix = load_image_batch(
            "/", [os.path.abspath(p).lstrip("/") for p in paths]
        )
        with lock:
            feats = enc.apply(
                {"params": clip_params}, preprocess_images(jnp.asarray(pix))
            )
        return np.asarray(feats)

    return encode


def _seeds_for(req, n):
    """Validated per-row seeds: default 0..n-1; an explicit list must match
    the row count (ValueError -> HTTP 400)."""
    seeds = req.get("seeds")
    if seeds in (None, []):
        return list(range(n))
    if not isinstance(seeds, list):
        raise ValueError("seeds must be a JSON array of ints")
    if len(seeds) != n:
        raise ValueError(f"seeds length {len(seeds)} != rows {n}")
    return seeds


def make_handler(service, run_name, encode_images):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200,
                    {"status": "ok", "run": run_name,
                     "stats": service.stats()},
                )
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._reply(400, {"error": "bad JSON"})
            try:
                if self.path == "/caption":
                    feats = req.get("features")
                    if feats is None:
                        return self._reply(400, {"error": "missing features"})
                    import numpy as np

                    feats = np.asarray(feats, np.float32)
                    if feats.ndim == 1:
                        feats = feats[None]
                    seeds = _seeds_for(req, len(feats))
                    # all device work rides the service's worker thread;
                    # concurrent requests share batches
                    caps = service.submit_many(feats, seeds, timeout=120.0)
                    return self._reply(200, {"captions": caps})
                if self.path == "/caption_image":
                    if encode_images is None:
                        return self._reply(
                            503, {"error": "no CLIP assets loaded"}
                        )
                    paths = req.get("paths") or []
                    if not paths:
                        return self._reply(400, {"error": "missing paths"})
                    feats = encode_images(paths)
                    seeds = _seeds_for(req, len(paths))
                    return self._reply(
                        200,
                        {"captions": service.submit_many(
                            feats, seeds, timeout=300.0)},
                    )
                return self._reply(404, {"error": "unknown path"})
            except TimeoutError as e:
                # server overload, not a client error
                return self._reply(503, {"error": str(e)})
            except ValueError as e:
                return self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface, don't crash
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_name")
    p.add_argument("--ckpt_dir", default=".")
    p.add_argument("--assets_dir", default=None)
    p.add_argument("--captions", default=None,
                   help="training captions CSV to rebuild the tokenizer")
    p.add_argument("--allow_random_clip", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8491)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in "
                        "this image — a startup hook initializes TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import signal
    import threading

    service, cfg = build_service(args)
    encode = build_image_encoder(args)
    service.start()
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(service, args.ckpt_name, encode),
    )
    # Graceful SIGTERM (the signal orchestrators send): stop accepting,
    # finish in-flight batches, drain the queue with errors. shutdown()
    # must come from another thread (it blocks until serve_forever exits).
    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=server.shutdown, daemon=True).start(),
    )
    print(f"serving {args.ckpt_name} on http://{args.host}:{args.port} "
          f"(max_batch={service.max_batch}, steps={service.stats()['steps']})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.stop()


if __name__ == "__main__":
    main()
