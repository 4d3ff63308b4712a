#!/usr/bin/env python
"""Device-side profile of the flagship train step: captures a jax.profiler
trace (works through the remote-TPU tunnel), aggregates per-XLA-op busy
time from the Chrome trace, and maps hot ``fusion.N`` names back to HLO.

The round-2 step accounting in docs/PERF.md was produced this way. Usage:

    python scripts/profile_step.py [--steps 5] [--out /tmp/jaxtrace]
    python scripts/profile_step.py --parse /tmp/jaxtrace   # re-parse only

The observability counterpart of utils/profiling.trace for ad-hoc use
(SURVEY.md section 5.1); the raw trace also opens in TensorBoard/xprof.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def capture(out_dir: str, steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    cfg = guard_config(Config(epoch_num=15, rounding_weight=0.3))
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    step = tr.make_train_step(model, cfg, tx)
    from bench import synthetic_batch

    batch = synthetic_batch(cfg)
    lam = jnp.asarray(0.3, jnp.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    jax.profiler.stop_trace()


def parse(out_dir: str, steps: int, top: int = 0) -> None:
    traces = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        raise SystemExit(f"no *.trace.json.gz under {out_dir}")
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    evs = data["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"]["name"]
    }
    tot = collections.defaultdict(float)
    cnt = collections.Counter()
    wall = 0.0
    for e in evs:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        name = e["name"]
        if name.isdigit():
            continue  # step-number markers on the "Steps" thread
        if name.startswith("jit_"):
            wall += e["dur"]
            continue
        fam = re.sub(r"[.\d]+$", "", name)
        tot[fam] += e["dur"]
        cnt[fam] += 1
    per_op = collections.defaultdict(float)
    op_n = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        name = e["name"]
        if name.isdigit() or name.startswith("jit_"):
            continue
        per_op[name] += e["dur"]
        op_n[name] += 1
    print(f"device module wall: {wall/steps/1e3:.2f} ms/step")
    print(f"{'family':<40} {'ms/step':>8} {'ops/step':>9}")
    for fam, d in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{fam[:40]:<40} {d/steps/1e3:8.3f} {cnt[fam]/steps:9.1f}")
    if top:
        print(f"\ntop {top} individual ops:")
        print(f"{'op':<40} {'ms/step':>8} {'calls/step':>11}")
        for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{name[:40]:<40} {d/steps/1e3:8.3f} {op_n[name]/steps:11.1f}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/jaxtrace")
    p.add_argument("--top", type=int, default=0,
                   help="also print the top-N individual ops")
    p.add_argument("--parse", default=None,
                   help="skip capture; parse an existing trace dir")
    args = p.parse_args()
    if args.parse:
        parse(args.parse, args.steps, args.top)
        return
    capture(args.out, args.steps)
    parse(args.out, args.steps, args.top)


if __name__ == "__main__":
    main()
