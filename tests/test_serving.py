"""Serving layer: micro-batching caption service + HTTP front-end.

The reference has no serving path (its zero-shot loop captions one image
per iteration, COCO_BLEU.py:246-253); serving.CaptionService is a
framework extension. These tests pin its contracts on CPU with the shared
tiny config: static-shape padding, per-request determinism independent of
batch composition, thread-safe micro-batching, input validation, and the
script's HTTP endpoints.
"""

import http.client
import importlib.util
import json
import os
import threading
import time

import jax
import numpy as np
import pytest

from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from diffusion_image_captioning_tpu.serving import CaptionService

from tests.tiny import TINY


class IdTokenizer:
    """decode = space-joined token ids (the service only needs .decode)."""

    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def service():
    model, params = init_denoiser(TINY, jax.random.PRNGKey(0))
    svc = CaptionService(
        model, TINY, params, IdTokenizer(), max_batch=4, max_wait_ms=20.0
    )
    svc.start()
    yield svc
    svc.stop()


def _feat(seed):
    return np.random.default_rng(seed).standard_normal(
        TINY.clip_dim
    ).astype(np.float32)


class TestCaptionService:
    def test_batch_and_padding(self, service):
        caps = service.caption_batch(np.stack([_feat(1), _feat(2), _feat(3)]))
        assert len(caps) == 3
        assert all(isinstance(c, str) and c for c in caps)

    def test_deterministic_per_request(self, service):
        """Same (features, seed) -> same caption regardless of the other
        rows in the batch (rows never interact at eval)."""
        f = _feat(7)
        alone = service.caption_batch(f[None], seeds=[11])[0]
        crowded = service.caption_batch(
            np.stack([_feat(8), f, _feat(9), _feat(10)]), seeds=[1, 11, 2, 3]
        )[1]
        assert alone == crowded
        # different seed -> different initial noise (and, generically,
        # a different refinement trajectory)
        other = service.caption_batch(f[None], seeds=[12])[0]
        assert isinstance(other, str)

    def test_submit_matches_direct(self, service):
        f = _feat(21)
        assert service.submit(f, seed=5, timeout=60) == service.caption_batch(
            f[None], seeds=[5]
        )[0]

    def test_concurrent_submits_share_batches(self, service):
        results = {}

        def worker(i):
            results[i] = service.submit(_feat(100 + i), seed=i, timeout=60)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        before = service.stats()["batches"]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 6 and all(results.values())
        stats = service.stats()
        # 6 requests over a 4-row max_batch need at least 2 launches; the
        # window should have packed them into far fewer than 6.
        assert 2 <= stats["batches"] - before <= 6
        assert stats["max_batch"] == 4

    def test_chunking_past_max_batch(self, service):
        feats = np.stack([_feat(i) for i in range(7)])  # > max_batch
        caps = service.caption_batch(feats)
        assert len(caps) == 7
        # chunking must not change row results
        assert caps[0] == service.caption_batch(feats[:1], seeds=[0])[0]

    def test_submit_many_through_worker(self, service):
        """submit_many rides the queue/worker and agrees with the direct
        path row-for-row (per-request determinism)."""
        feats = np.stack([_feat(30), _feat(31), _feat(32), _feat(33), _feat(34)])
        via_queue = service.submit_many(feats, seeds=[7, 8, 9, 10, 11],
                                        timeout=60)
        direct = service.caption_batch(feats, seeds=[7, 8, 9, 10, 11])
        assert via_queue == direct
        with pytest.raises(ValueError):
            service.submit_many(feats, seeds=[1, 2])

    def test_stop_drains_pending(self):
        """A request stranded in the queue at stop() errors out instead of
        blocking its caller forever."""
        model, params = init_denoiser(TINY, jax.random.PRNGKey(1))
        svc = CaptionService(
            model, TINY, params, IdTokenizer(), max_batch=2, max_wait_ms=5.0
        )
        # never started: enqueue directly, then stop() must drain
        errors = []

        def caller():
            try:
                svc.submit(_feat(0), timeout=30)
            except RuntimeError as e:
                errors.append(e)

        t = threading.Thread(target=caller)
        t.start()
        deadline = time.monotonic() + 10
        while svc._queue.empty():  # wait for the item to land
            assert time.monotonic() < deadline, "caller never enqueued"
        svc.stop()
        t.join(timeout=10)
        assert not t.is_alive()
        assert len(errors) == 1 and "stopped" in str(errors[0])

    def test_clean_stop_then_restart(self):
        """stop() -> start() restart works after a CLEAN stop; a second
        start() on a live service refuses (two workers sharing the queue
        would issue concurrent device calls — the wedge condition)."""
        model, params = init_denoiser(TINY, jax.random.PRNGKey(2))
        svc = CaptionService(
            model, TINY, params, IdTokenizer(), max_batch=2, max_wait_ms=5.0
        )
        svc.start(warmup=False)
        with pytest.raises(RuntimeError, match="already has a worker"):
            svc.start(warmup=False)
        svc.stop()
        svc.start(warmup=False)  # restart after clean stop
        cap = svc.submit(_feat(0), timeout=60)
        assert isinstance(cap, str) and cap
        svc.stop()

    def test_validation(self, service):
        with pytest.raises(ValueError):
            service.submit(np.zeros(TINY.clip_dim + 1, np.float32))
        with pytest.raises(ValueError):
            service.caption_batch(np.zeros((2, 3), np.float32))
        with pytest.raises(ValueError):
            service.caption_batch(
                np.zeros((2, TINY.clip_dim), np.float32), seeds=[1]
            )


class TestHttpFrontend:
    @pytest.fixture(scope="class")
    def server(self, service):
        spec = importlib.util.spec_from_file_location(
            "serve_captions",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts",
                "serve_captions.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from http.server import ThreadingHTTPServer

        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), mod.make_handler(service, "tiny-run", None)
        )
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield httpd.server_address
        httpd.shutdown()

    def _req(self, addr, method, path, body=None):
        conn = http.client.HTTPConnection(*addr, timeout=60)
        conn.request(
            method, path,
            body=json.dumps(body) if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        out = json.loads(r.read())
        conn.close()
        return r.status, out

    def test_healthz(self, server):
        status, out = self._req(server, "GET", "/healthz")
        assert status == 200 and out["status"] == "ok"
        assert out["run"] == "tiny-run" and "stats" in out

    def test_caption_roundtrip(self, server, service):
        f = _feat(55)
        status, out = self._req(
            server, "POST", "/caption",
            {"features": [f.tolist()], "seeds": [3]},
        )
        assert status == 200
        assert out["captions"] == [service.caption_batch(f[None], seeds=[3])[0]]

    def test_caption_multi(self, server):
        status, out = self._req(
            server, "POST", "/caption",
            {"features": [_feat(60).tolist(), _feat(61).tolist()]},
        )
        assert status == 200 and len(out["captions"]) == 2

    def test_errors(self, server):
        assert self._req(server, "POST", "/caption", {})[0] == 400
        # malformed seeds must be a client error, not a 500
        assert self._req(
            server, "POST", "/caption",
            {"features": [_feat(70).tolist()], "seeds": 7},
        )[0] == 400
        assert self._req(
            server, "POST", "/caption",
            {"features": [_feat(71).tolist()], "seeds": [1, 2]},
        )[0] == 400
        assert self._req(server, "POST", "/nope", {"x": 1})[0] == 404
        assert self._req(server, "GET", "/nope")[0] == 404
        # image endpoint without CLIP assets -> 503
        assert (
            self._req(server, "POST", "/caption_image", {"paths": ["x.jpg"]})[0]
            == 503
        )
