#!/usr/bin/env python
"""Long-soak the caption server under the wedge regime (VERDICT round-4
stretch #8).

Training survives this environment's failure modes (tunnel wedges, drain
stalls) because supervisors/watchdogs detect and recover them; this script
proves the production-INFERENCE layer under the same regime: it launches
``scripts/serve_captions.py`` on the real TPU as its own process group,
drives closed-loop HTTP clients for ``--minutes``, and writes a JSON
capacity report (throughput, latency percentiles, largest completion gap).

Stall handling mirrors the training watchdog: if NO request completes for
``--stall_timeout`` seconds, the soak kills the server and exits 2 — a
wedged serving process must fail loudly, never hang the round.

The server pid lands in ``runs/serving_soak.pid`` (covered by
scripts/deadline_guard.sh PID_GLOBS ``runs/*.pid``) so an overrunning soak
is group-killed at the round deadline.

    python scripts/serving_soak.py RUN_NAME --ckpt_dir runs_combined_v3 \
        --captions /tmp/corrworld_ck/captions.txt --minutes 30

Reference: no counterpart — the reference captions one image per Python
iteration (COCO_BLEU.py:246-253) and has no server to soak.
"""

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post(url: str, payload: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read().decode())


def _get(url: str, timeout: float) -> dict:
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode())


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_name")
    p.add_argument("--ckpt_dir", default=".")
    p.add_argument("--captions", default=None)
    p.add_argument("--assets_dir", default=None)
    p.add_argument("--minutes", type=float, default=30.0)
    p.add_argument("--clients", type=int, default=8,
                   help="closed-loop client threads")
    p.add_argument("--rows", type=int, default=4,
                   help="feature rows (captions) per request")
    p.add_argument("--clip_dim", type=int, default=512)
    p.add_argument("--port", type=int, default=8493)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--stall_timeout", type=float, default=300.0,
                   help="seconds with zero completions before declaring "
                        "the server wedged (training watchdog analogue)")
    p.add_argument("--request_timeout", type=float, default=120.0)
    p.add_argument("--out", default="runs/serving_soak.json")
    p.add_argument("--cpu", action="store_true",
                   help="pass --cpu through to the server (CI/smoke)")
    args = p.parse_args()

    # ---- launch the server as its own process group -------------------
    cmd = [
        sys.executable, os.path.join(_REPO, "scripts", "serve_captions.py"),
        args.ckpt_name, "--ckpt_dir", args.ckpt_dir,
        "--port", str(args.port), "--max_batch", str(args.max_batch),
    ]
    if args.captions:
        cmd += ["--captions", args.captions]
    if args.assets_dir:
        cmd += ["--assets_dir", args.assets_dir]
    if args.steps is not None:
        cmd += ["--steps", str(args.steps)]
    if args.cpu:
        cmd += ["--cpu"]
    log_path = os.path.join(_REPO, "runs", "serving_soak_server.log")
    os.makedirs(os.path.join(_REPO, "runs"), exist_ok=True)
    server_log = open(log_path, "w")
    server = subprocess.Popen(
        cmd, cwd=_REPO, stdout=server_log, stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    pid_file = os.path.join(_REPO, "runs", "serving_soak.pid")
    with open(pid_file, "w") as f:
        f.write(str(server.pid))

    base = f"http://127.0.0.1:{args.port}"

    def _kill_server() -> None:
        try:
            os.killpg(server.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        try:
            os.remove(pid_file)  # a stale pid file gets a RECYCLED pid
        except OSError:          # killed at the deadline (CLAUDE.md)
            pass

    # ---- wait for warmup (first compile can take a while) -------------
    deadline = time.monotonic() + 900
    while True:
        if server.poll() is not None:
            print(f"server exited rc={server.returncode} before healthy; "
                  f"see {log_path}", file=sys.stderr)
            _kill_server()
            sys.exit(1)
        try:
            h = _get(base + "/healthz", timeout=5)
            if h.get("status") == "ok":
                break
        except (urllib.error.URLError, socket.timeout, ConnectionError):
            pass
        if time.monotonic() > deadline:
            print("server never became healthy in 900 s", file=sys.stderr)
            _kill_server()
            sys.exit(1)
        time.sleep(5)
    print(f"[soak] server healthy (pid {server.pid}); "
          f"{args.clients} clients x {args.rows} rows for "
          f"{args.minutes:.1f} min", flush=True)

    # ---- closed-loop clients ------------------------------------------
    import numpy as np

    stop = threading.Event()
    lock = threading.Lock()
    latencies: list = []          # seconds per request
    counts = {"requests": 0, "captions": 0, "errors": 0}
    last_done = [time.monotonic()]
    rng = np.random.default_rng(0)
    # one shared feature pool: realistic distinct inputs, no per-request
    # host RNG cost in the hot loop (CLAUDE.md: host-side numpy per row
    # is minutes at scale on this single core)
    pool = rng.normal(size=(256, args.rows, args.clip_dim)).astype(np.float32)

    def client(idx: int) -> None:
        i = idx
        while not stop.is_set():
            feats = pool[i % len(pool)]
            i += args.clients
            t0 = time.monotonic()
            try:
                out = _post(
                    base + "/caption",
                    {"features": feats.tolist(),
                     "seeds": list(range(i, i + args.rows))},
                    timeout=args.request_timeout,
                )
                dt = time.monotonic() - t0
                with lock:
                    latencies.append(dt)
                    counts["requests"] += 1
                    counts["captions"] += len(out.get("captions", []))
                    last_done[0] = time.monotonic()
            except Exception:
                if stop.is_set():
                    break  # shutdown race: the server is being killed
                with lock:
                    counts["errors"] += 1
                time.sleep(1.0)

    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(args.clients)
    ]
    t_start = time.monotonic()
    for t in threads:
        t.start()

    # ---- monitor: progress + stall watchdog ---------------------------
    t_end = t_start + args.minutes * 60
    wedged = False
    max_gap = 0.0
    while time.monotonic() < t_end:
        time.sleep(min(30.0, max(1.0, t_end - time.monotonic())))
        with lock:
            done = counts["captions"]
            gap = time.monotonic() - last_done[0]
        max_gap = max(max_gap, gap)
        el = time.monotonic() - t_start
        print(f"[soak] t={el:.0f}s captions={done} "
              f"rate={done / max(el, 1e-9):.1f}/s gap={gap:.0f}s "
              f"errors={counts['errors']}", flush=True)
        if gap > args.stall_timeout:
            print(f"[soak] WEDGE: no completion for {gap:.0f} s "
                  f"(> {args.stall_timeout:.0f}) — killing server",
                  file=sys.stderr, flush=True)
            wedged = True
            break
        if server.poll() is not None:
            print(f"[soak] server DIED rc={server.returncode}",
                  file=sys.stderr, flush=True)
            wedged = True
            break
    stop.set()

    stats = None
    if not wedged:
        try:
            stats = _get(base + "/healthz", timeout=10).get("stats")
        except Exception:
            pass
    wall = time.monotonic() - t_start
    _kill_server()
    for t in threads:
        t.join(timeout=5)

    with lock:
        lat = np.sort(np.asarray(latencies, np.float64))
    pct = (
        {
            "p50_ms": round(float(lat[int(0.50 * (len(lat) - 1))]) * 1e3, 1),
            "p95_ms": round(float(lat[int(0.95 * (len(lat) - 1))]) * 1e3, 1),
            "p99_ms": round(float(lat[int(0.99 * (len(lat) - 1))]) * 1e3, 1),
            "max_ms": round(float(lat[-1]) * 1e3, 1),
        }
        if len(lat)
        else {}
    )
    report = {
        "wall_s": round(wall, 1),
        "clients": args.clients,
        "rows_per_request": args.rows,
        "requests": counts["requests"],
        "captions": counts["captions"],
        "errors": counts["errors"],
        "throughput_captions_per_s": round(counts["captions"] / wall, 2),
        "latency": pct,
        "max_completion_gap_s": round(max_gap, 1),
        "stall_timeout_s": args.stall_timeout,
        "wedged": wedged,
        "server_stats": stats,
        "ckpt": args.ckpt_name,
        "steps": args.steps,
    }
    out_path = os.path.join(_REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report))
    sys.exit(2 if wedged else 0)


if __name__ == "__main__":
    main()
