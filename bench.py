"""Headline benchmark: flagship training-step throughput on TPU.

Prints ONE compact JSON line (<= MAX_FINAL_LINE_BYTES — the driver tails
stdout and parses the last line, and round-3's fat line broke that):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "matmul_mfu_pct": N, "extras_file": "runs/bench_extras.json"}
The full blob (same headline fields + every secondary claim under
"extras") is written to the extras_file the line points at.

Baseline: the reference trains Flickr8k for 15 epochs in 5 h on one A30
(README.md:15) at ~4,045 optimizer steps/epoch (batch 8, 0.8 x 40,455
captions), i.e. ~3.37 steps/s, where each step pushes an effective batch of
SAMPLE_SIZE*BATCH_SIZE = 800 rows (+8 x_1 rows) of seq-16x768 through the
denoiser twice (fwd+bwd). We measure the same unit — optimizer steps/s of
the identical flagship configuration (DistilBERT-base denoiser, concat
fusion, x0-prediction, all three loss terms, AdamW) — on one TPU chip.

``extras`` carries the secondary perf claims (VERDICT round-1 item 6) so
BENCH_r*.json substantiates them from checked-in code: full-size sampler
latencies at batch 64 — the reference 5-step refinement protocol plus the
100-step ancestral DDPM / 50-step DDIM extensions (BASELINE.md's
"sub-second batched 100-step sampling" target). Pass --train-only to skip
them (they add three compiles).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A30_STEPS_PER_SEC = 4045 * 15 / (5 * 3600)  # ~3.37 (README.md:15)


def _combined_epoch_walls(out_dir: str):
    """Epoch-ordered [(segment_log, wall_s), ...] parsed from the artifact.

    Reuses scripts/combined_summary.py (pure stdlib) so the benched walls
    always match `python scripts/combined_summary.py` over the same tree.
    """
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_combined_summary",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts",
                "combined_summary.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.collect_epoch_walls(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), out_dir)
        )
    except Exception:
        return []


def _parity_lines(run_dir: str) -> list:
    """Contract lines (epoch averages + BLEU) of a run dir's codec-named
    log, for deriving A/B byte-identity claims at bench time."""
    import glob
    import re

    logs = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                run_dir,
                "epoch*_*.txt",
            )
        )
    )
    if not logs:
        return []
    with open(logs[-1], "rb") as f:
        text = f.read().decode("utf-8", "replace")
    return re.findall(r"^(?:epoch \d+ average .*|BLEU-4 .*)$", text, re.M)


# The driver tails stdout and json-parses the LAST line; round-3's line
# grew past its capture (BENCH_r03 parsed:null). The final line is now a
# compact summary under this cap, with every secondary claim written to
# the extras file it points at (VERDICT round-3 next #1).
MAX_FINAL_LINE_BYTES = 500


def final_line(compact: dict, extras_file: str | None) -> str:
    """One compact JSON line, <= MAX_FINAL_LINE_BYTES. Fixed keys and
    bounded numbers keep it ~250 B structurally; the cap is contractual,
    so least-important optional keys are dropped if it would ever
    overflow."""
    d = dict(compact)
    if extras_file is not None:
        d["extras_file"] = extras_file
    line = json.dumps(d)
    # Shed least-important first: the constant descriptive 'unit' string
    # goes before any number; matmul_mfu_pct (driver-required, round-3
    # verdict) is only ever shed as the final numeric (ADVICE round-4).
    for k in (
        "unit",
        "sampler_ancestral100_ms_b64",
        "combined_vs_a30",
        "matmul_mfu_pct",
    ):
        if len(line.encode()) <= MAX_FINAL_LINE_BYTES:
            break
        d.pop(k, None)
        line = json.dumps(d)
    if len(line.encode()) > MAX_FINAL_LINE_BYTES:
        # Last resort for a pathological compact dict: the extras pointer
        # is recoverable from BENCH_EXTRAS_FILE / the default path.
        d.pop("extras_file", None)
        line = json.dumps(d)
    return line


def write_extras(payload: dict, path: str | None = None) -> str:
    """Write the full bench blob next to the compact line's pointer.
    Returns the repo-relative path recorded in the final line."""
    rel = path or os.environ.get(
        "BENCH_EXTRAS_FILE", os.path.join("runs", "bench_extras.json")
    )
    abs_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), rel)
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    with open(abs_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    return rel


def _parse_mesh_arg() -> dict | None:
    """--mesh data=8[,model=2] -> {"data": 8, "model": 2} (None if absent)."""
    if "--mesh" not in sys.argv:
        return None
    spec = sys.argv[sys.argv.index("--mesh") + 1]
    axes = {"data": 1, "model": 1}
    for part in spec.split(","):
        k, v = part.split("=")
        if k not in axes:
            raise SystemExit(f"--mesh axis must be data/model, got {k!r}")
        axes[k] = int(v)
    return axes


def main() -> None:
    mesh_axes = _parse_mesh_arg()
    if mesh_axes is not None:
        # The real DP/TP path end to end (VERDICT round-2 item 5): the exact
        # flagship train step jitted over a Mesh with sharded batches. Runs
        # unmodified on a real multi-chip slice; on this one-chip-only
        # environment it validates on the virtual CPU mesh. XLA_FLAGS is
        # read at backend init, so the virtual device count must be set
        # BEFORE the first jax.devices() call (conftest.py pattern).
        n_need = mesh_axes["data"] * mesh_axes["model"]
        _flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in _flags:
            os.environ["XLA_FLAGS"] = (
                _flags + f" --xla_force_host_platform_device_count={n_need}"
            ).strip()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if mesh_axes is not None and len(jax.devices()) < n_need:
        # fallback self-heal (e.g. a stale smaller force-count in the env)
        from __graft_entry__ import _ensure_virtual_devices

        _ensure_virtual_devices(n_need)
    import jax.numpy as jnp
    import numpy as np

    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu import train as tr

    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    cfg = Config(
        epoch_num=15,
        rounding_weight=0.3,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    if "--tiny" in sys.argv:
        # Structural smoke sizing for the CPU mesh leg (XLA:CPU compiles the
        # full-size partitioned step in many minutes on this one-core host);
        # a real slice runs the flagship shape by simply omitting the flag.
        cfg = cfg.replace(
            dim=64, n_layers=2, n_heads=4, hidden_dim=128, vocab_size=256,
            max_length=8, sample_size=4, step_tot=50,
        )
    if on_tpu:
        # The remote Mosaic compiler can hang on some kernel forms; a hang
        # here would leave the round with NO benchmark line. Compile-check
        # the attention kernel (at the EXACT shape the step will compile)
        # in a sacrificial subprocess first and fall back to XLA attention
        # (~5% slower step) if it doesn't come back.
        from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

        cfg = guard_config(cfg)

    mesh = mesh_ctx = None
    if mesh_axes is not None:
        import contextlib

        from diffusion_image_captioning_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(
            data=mesh_axes["data"],
            model=mesh_axes["model"],
            devices=jax.devices()[: mesh_axes["data"] * mesh_axes["model"]],
        )
        # Same global effective batch: the leading batch axis shards over
        # `data`, so batch_size must divide evenly (flagship 8 over data=8
        # -> the 101-row per-chip shard measured in bench/dp_projection.py).
        if cfg.batch_size % mesh_axes["data"]:
            raise SystemExit(
                f"batch_size {cfg.batch_size} not divisible by data={mesh_axes['data']}"
            )
        mesh_ctx = lambda: jax.set_mesh(mesh)  # noqa: E731
    else:
        import contextlib

        mesh_ctx = contextlib.nullcontext

    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    step = tr.make_train_step(model, cfg, tx)

    from bench import synthetic_batch

    batch = synthetic_batch(cfg)
    if mesh is not None:
        from diffusion_image_captioning_tpu.parallel import mesh as mesh_lib

        state = jax.device_put(state, mesh_lib.param_shardings(state, mesh))
        batch = mesh_lib.shard_batch(batch, mesh)
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)

    # Warmup / compile.
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        with mesh_ctx():
            state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])

    n_steps = 30 if on_tpu else 5
    if "--steps" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        with mesh_ctx():
            state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt

    if mesh is not None:
        # Mesh mode prints its own line and stops: sampler/projection extras
        # are single-chip claims.
        print(
            json.dumps(
                {
                    "metric": "train_steps_per_sec_flagship_mesh",
                    "value": round(steps_per_sec, 4),
                    "unit": (
                        f"optimizer steps/s, global batch "
                        f"{cfg.sample_size * cfg.batch_size}, mesh "
                        f"{dict(mesh.shape)}, backend {jax.default_backend()}"
                    ),
                    "vs_baseline": round(steps_per_sec / A30_STEPS_PER_SEC, 3),
                    "extras": {
                        "loss_total": round(float(metrics["total"]), 4),
                        "tiny": "--tiny" in sys.argv,
                        "n_steps": n_steps,
                    },
                }
            )
        )
        return

    extras = {}
    if on_tpu:
        # Matmul MFU of the measured step: explicit FLOP count from
        # bench/batch_scaling.py (the probe that established the ~50%
        # plateau), against the v5e bf16 peak.
        from bench.batch_scaling import V5E_BF16_TFLOPS, step_matmul_tflops

        extras["matmul_mfu_pct"] = round(
            100 * step_matmul_tflops(cfg) / (dt / n_steps) / V5E_BF16_TFLOPS, 1
        )
    if "--train-only" not in sys.argv:
        extras.update(bench_samplers(model, cfg, tr.merge_params(
            state.trainable, state.frozen
        )))
        try:
            # DP-8 projection from the measured per-chip shard step —
            # shared implementation in bench/dp_projection.py (which also
            # documents the all-reduce model and its assumptions).
            from bench.dp_projection import measure_dp8

            extras["dp8_projection"] = measure_dp8(cfg)
        except Exception as e:  # noqa: BLE001 — extras must never kill the line
            extras["dp8_projection"] = {"error": f"{type(e).__name__}: {e}"}
        try:
            # Eval-leg rates (VERDICT round-3 next #1c): the combined
            # protocol spent ~50% of each epoch OUTSIDE train steps, so the
            # eval legs are benchmarked like the train step — val-loss
            # batches/s and from-noise BLEU sampling batches/s at the
            # reference loop shape (G=1) vs the grouped device call
            # (Config.bleu_sample_group).
            extras["eval_leg"] = bench_eval_leg(model, cfg, state)
        except Exception as e:  # noqa: BLE001
            extras["eval_leg"] = {"error": f"{type(e).__name__}: {e}"}
        # Archived end-to-end wall-clock at the reference's own headline
        # protocol (README.md:15: 15 epochs of Flickr8k in 5 h on one A30),
        # driven at identical scale/math on one v5e chip 2026-08-18 —
        # runs/flagship_synthetic_8kscale_15ep_reference_protocol.txt and
        # docs/PERF.md. Static pointer, not re-measured here (the full run
        # takes ~63 min; reproduce with scripts/run_correlated_world.py
        # --epochs 15 --segments 3 --images 8091 --train_set_ratio 0.8).
        # Mesh-mode smoke (VERDICT round-2 item 5): the real sharded train
        # step end-to-end via `bench.py --mesh data=8` — validated on the
        # virtual 8-device CPU mesh 2026-08-19 (no multi-chip hardware
        # here); the identical code path runs the flagship shape on a real
        # slice by omitting --tiny. Static record, not re-measured here.
        extras["mesh_smoke"] = {
            "cmd": "bench.py --mesh data=8 --tiny --steps 3",
            "backend": "cpu (8 virtual devices)",
            "steps_per_sec": 21.4,
            "loss_total": 39.3438,
            "date": "2026-08-19",
        }
        extras["reference_protocol_15ep_wall"] = {
            "wall_s": 3800,
            "a30_wall_s": 18000,
            "vs_a30_end_to_end": 4.74,
            "steady_state_steps_per_sec": 20.3,
            "artifact": "runs/flagship_synthetic_8kscale_15ep_reference_protocol.txt",
        }
        # The reference's SECOND published protocol (README.md:15: 10 epochs
        # of Flickr30k+8k combined, 11 h on one A30) at identical shape —
        # 199,370 captions, 0.8 split, 19,937 steps/epoch at batch 8 —
        # driven to completion (10/10) on one v5e 2026-08-19 as 1-epoch
        # continue_train segments (runs_combined/, docs/PERF.md). Per-epoch
        # walls are parsed from the committed segment logs at bench time
        # (scripts/combined_summary.py), so this record cannot drift from
        # the artifact it cites.
        _combined_walls = [w for _, w, _ in _combined_epoch_walls("runs_combined")]
        if _combined_walls:
            extras["combined_protocol_10ep_wall"] = {
                "epochs_completed": len(_combined_walls),
                "epoch_walls_s": [round(w) for w in _combined_walls],
                "wall_s_measured_sum": round(sum(_combined_walls)),
                "steps_per_epoch": 19937,
                "in_epoch_steps_per_sec": 19.912,
                "wall_10ep_s": round(
                    sum(_combined_walls) * 10.0 / len(_combined_walls)
                ),
                "a30_wall_s": 39600,
                "vs_a30_end_to_end": round(
                    39600 * len(_combined_walls) / (10.0 * sum(_combined_walls)), 2
                ),
                "artifact": "runs_combined/README.md",
            }
        # v2 of the same protocol (round 4): schedule-correct 2-epoch
        # continue_train segments (--schedule_offset/--schedule_total, the
        # 10-epoch linspace anneal reproduced across segments) with the
        # grouped eval legs (Config.bleu_sample_group=64,
        # Config.eval_loss_group=16) that cut the ~47% non-train overhead
        # measured in v1. Walls are per-SEGMENT (2 epochs each).
        _v2 = _combined_epoch_walls("runs_combined_v2")
        _v2_walls = [w for _, w, _ in _v2]
        if _v2_walls:
            _v2_epochs = 2 * len(_v2_walls)
            extras["combined_protocol_v2_wall"] = {
                "segments_completed": len(_v2_walls),
                "epochs_completed": _v2_epochs,
                "segment_walls_s": [round(w) for w in _v2_walls],
                "lower_bound_segments": [
                    rel for rel, _, exact in _v2 if not exact
                ],
                "wall_s_measured_sum": round(sum(_v2_walls)),
                "steps_per_epoch": 19937,
                "wall_10ep_s": round(sum(_v2_walls) * 10.0 / _v2_epochs),
                "a30_wall_s": 39600,
                "vs_a30_end_to_end": round(
                    39600 * _v2_epochs / (10.0 * sum(_v2_walls)), 2
                ),
                "artifact": "runs_combined_v2/",
            }
        # Round-5 evidence blocks, parsed from their artifacts (same
        # no-drift policy as the wall blocks above).
        import glob as _glob
        import re as _re

        _v21 = _combined_epoch_walls("runs_combined_v21")
        if _v21 and _v2_walls:
            _saves = []
            for _sl in sorted(_glob.glob("runs_combined_v21/segment_a*.log")):
                with open(_sl, "rb") as _f:
                    _saves += [
                        float(x) for x in _re.findall(
                            rb"checkpoint save \(final\): ([0-9.]+)s", _f.read()
                        )
                    ]
            # Deterministic per-segment saving = v2's measured save leg
            # (61.5 s) minus the overlapped save measured here.
            _save_delta = (
                61.5 - sum(_saves) / len(_saves) if _saves else 0.0
            )
            _recomputed = sum(_v2_walls) - len(_v2_walls) * _save_delta
            # Byte-identity of the A/B claim is DERIVED at bench time by
            # diffing the contract lines (epoch averages + BLEU) of the two
            # codec-named logs over their shared prefix — a hardcoded True
            # could silently drift from the committed artifacts (ADVICE
            # round-3).
            _pl21 = _parity_lines("runs_combined_v21")
            _pl2 = _parity_lines("runs_combined_v2")
            _shared = min(len(_pl21), len(_pl2))
            extras["combined_protocol_v21_ab"] = {
                "segment_walls_s": [round(w) for _, w, _ in _v21],
                "v2_counterpart_walls_s": [
                    round(w) for w in _v2_walls[: len(_v21)]
                ],
                "save_final_s": _saves,
                "byte_identical_losses_and_bleu": bool(
                    _shared and _pl21[:_shared] == _pl2[:_shared]
                ),
                "artifact": "runs_combined_v21/README.md",
            }
            if _recomputed > 0:
                extras["combined_protocol_v21_ab"].update(
                    recomputed_10ep_wall_s=round(_recomputed),
                    recomputed_vs_a30=round(39600 / _recomputed, 2),
                )
        _grid = {}
        for _arm_dir in sorted(_glob.glob("runs/trial_grid/*/")):
            _arm = os.path.basename(_arm_dir.rstrip("/"))
            if not os.path.exists(os.path.join(_arm_dir, "DONE")):
                continue
            # sorted + last by name: an arm dir re-run at a different epoch
            # count accumulates several codec logs, and an unsorted glob
            # makes the reported BLEU nondeterministic (ADVICE round-3).
            _logs = sorted(_glob.glob(os.path.join(_arm_dir, "epoch*_*.txt")))
            if not _logs:
                continue
            with open(_logs[-1], "rb") as _f:
                _t = _f.read().decode("utf-8", "replace")
            _d = _re.findall(
                r"BLEU-4 draws \(n=\d+\): mean ([\d.]+) sd ([\d.]+)", _t
            )
            if _d:
                _grid[_arm] = {
                    "bleu": float(_d[-1][0]), "sd": float(_d[-1][1])
                }
        if _grid:
            _base = _grid.get("baseline", {}).get("bleu")
            # Ordering claims exist only for arms whose REFERENCE logs end
            # with a BLEU score (trial_grid_summary.py GATING list). The
            # round-6 train_embed/dynamic1/char-slice arms are wedge-free
            # at-scale runs on axes whose reference logs carry no BLEU —
            # counting them here would silently dilute the 7/7 claim.
            _gated = {
                "add", "xt100", "round05", "cfg_w1",
                "cosine", "logspace", "cfg_w03",
            }
            extras["trial_grid"] = {
                "arms": _grid,
                "orderings_reproduced": sum(
                    1 for _a, _r in _grid.items()
                    if _a in _gated and _base is not None
                    and _base > _r["bleu"]
                ),
                "orderings_total": len(_gated & set(_grid)),
                "artifact": "runs/trial_grid/README.md",
            }
        # 15-epoch schedule-axis arms (round 6, runs/trial_grid_15ep/):
        # the within-axis cosine-vs-logspace verdict at the reference's
        # full protocol length.
        _grid15 = {}
        for _arm_dir in sorted(_glob.glob("runs/trial_grid_15ep/*/")):
            _arm = os.path.basename(_arm_dir.rstrip("/"))
            if not os.path.exists(os.path.join(_arm_dir, "DONE")):
                continue
            _logs = sorted(_glob.glob(os.path.join(_arm_dir, "epoch*_*.txt")))
            if not _logs:
                continue
            with open(_logs[-1], "rb") as _f:
                _t = _f.read().decode("utf-8", "replace")
            _d = _re.findall(
                r"BLEU-4 draws \(n=\d+\): mean ([\d.]+) sd ([\d.]+)", _t
            )
            if _d:
                _grid15[_arm] = {
                    "bleu": float(_d[-1][0]), "sd": float(_d[-1][1])
                }
        if _grid15:
            _e = {"arms": _grid15, "artifact": "runs/trial_grid_15ep/README.md"}
            if "cosine" in _grid15 and "logspace" in _grid15:
                _e["reference_ordering_cosine_gt_logspace"] = (
                    _grid15["cosine"]["bleu"] > _grid15["logspace"]["bleu"]
                )
            extras["trial_grid_15ep"] = _e

        # Serving soak capacity (scripts/serving_soak.py, round 7): the
        # most recent committed report.
        _soaks = sorted(_glob.glob("runs/serving_soak*.json"))
        if _soaks:
            try:
                with open(_soaks[-1]) as _sf:
                    _soak = json.load(_sf)
                extras["serving_soak"] = {
                    "artifact": _soaks[-1],
                    "wall_s": _soak.get("wall_s"),
                    "throughput_captions_per_s": _soak.get(
                        "throughput_captions_per_s"
                    ),
                    "latency": _soak.get("latency"),
                    "errors": _soak.get("errors"),
                    "wedged": _soak.get("wedged"),
                }
            except Exception:
                pass

        # v3 of the combined protocol (round 6): 5-epoch schedule-correct
        # segments + tuned EMA — segment length parsed from the codec name
        # (epoch<seg>_*), walls from the committed segment logs.
        _v3 = _combined_epoch_walls("runs_combined_v3")
        _v3_logs = sorted(_glob.glob("runs_combined_v3/epoch*_*.txt"))
        if _v3 and _v3_logs:
            _se = int(
                _re.match(r"epoch(\d+)_", os.path.basename(_v3_logs[-1])).group(1)
            )
            # Per-segment epoch counts from each segment log's phase lines —
            # segments need not share a length (e.g. a shorter remainder
            # segment); a uniform _se * nseg would silently mis-scale
            # epochs_completed and vs_a30_end_to_end (ADVICE round-4).
            _v3_seg_eps = []
            for _rel, _, _ in _v3:
                try:
                    with open(
                        os.path.join("runs_combined_v3", _rel), "rb"
                    ) as _sf:
                        _sd = _sf.read().decode("utf-8", "replace")
                    _n_ep = len(
                        _re.findall(r"^\[phase\] epoch \d+: train ", _sd, _re.M)
                    )
                except OSError:
                    _n_ep = 0
                _v3_seg_eps.append(_n_ep or _se)
            _v3_walls = [w for _, w, _ in _v3]
            _v3_ep = sum(_v3_seg_eps)
            if _v3_ep and sum(_v3_walls) > 0:
                extras["combined_protocol_v3_wall"] = {
                    "segments_completed": len(_v3_walls),
                    "seg_epochs": _v3_seg_eps,
                    "epochs_completed": _v3_ep,
                    "segment_walls_s": [round(w) for w in _v3_walls],
                    "lower_bound_segments": [
                        rel for rel, _, exact in _v3 if not exact
                    ],
                    "wall_s_measured_sum": round(sum(_v3_walls)),
                    "wall_10ep_s": round(sum(_v3_walls) * 10.0 / _v3_ep),
                    "a30_wall_s": 39600,
                    "vs_a30_end_to_end": round(
                        39600 * _v3_ep / (10.0 * sum(_v3_walls)), 2
                    ),
                    "artifact": "runs_combined_v3/README.md",
                }

    compact = {
        "metric": "train_steps_per_sec_flagship",
        "value": round(steps_per_sec, 4),
        "unit": "optimizer steps/s (effective batch 800, DistilBERT-base denoiser)",
        "vs_baseline": round(steps_per_sec / A30_STEPS_PER_SEC, 3),
    }
    if "matmul_mfu_pct" in extras:
        compact["matmul_mfu_pct"] = extras["matmul_mfu_pct"]
    if "ancestral100_ms_b64" in extras:
        compact["sampler_ancestral100_ms_b64"] = extras["ancestral100_ms_b64"]
    # Best available end-to-end combined claim (v3 protocol > v2.1 A/B).
    for _k, _f in (
        ("combined_protocol_v3_wall", "vs_a30_end_to_end"),
        ("combined_protocol_v21_ab", "recomputed_vs_a30"),
    ):
        _v = extras.get(_k, {}).get(_f)
        if _v is not None:
            compact["combined_vs_a30"] = _v
            break
    rel = write_extras(dict(compact, extras=extras))
    print(final_line(compact, rel))


def bench_eval_leg(model, cfg, state):
    """Device rates of the two eval legs that dominate epoch overhead.

    * val-loss: one make_eval_step call per val batch (batch 8 -> 808 rows
      through the denoiser, no grad) — the reference's validation loop
      (CLIP-DDPM.py:488-501).
    * BLEU sampling: refine-5 from noise + on-device argmax per batch 8 —
      timed at the reference loop shape (one device call per batch, G=1)
      and grouped 64-batches-per-call (bit-identical scores,
      tests/test_eval_group.py). The ratio is the round-trip overhead the
      grouped call removes from 4,984 batches/epoch at combined scale.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import synthetic_batch
    from diffusion_image_captioning_tpu import sample as sp
    from diffusion_image_captioning_tpu import train as tr

    out = {}
    ev = tr.make_eval_step(model, cfg)
    batch = synthetic_batch(cfg)
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(2)
    m = None
    for _ in range(2):
        key, k = jax.random.split(key)
        m = ev(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        m = ev(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    out["val_loss_batches_per_sec"] = round(n / (time.perf_counter() - t0), 2)

    params = tr.merge_params(state.trainable, state.frozen)
    clip = np.random.default_rng(0).normal(
        size=(cfg.batch_size, cfg.clip_dim)
    ).astype(np.float32)

    def rate_single(iters=20):
        sp.sample_caption_ids(model, cfg, params, clip, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        for i in range(iters):
            sp.sample_caption_ids(
                model, cfg, params, clip, jax.random.PRNGKey(i)
            )
        return iters / (time.perf_counter() - t0)

    def rate_grouped(g, iters=3):
        keys = list(jax.random.split(jax.random.PRNGKey(3), g))
        clips = [clip] * g
        sp.sample_caption_ids_grouped(model, cfg, params, clips, keys)
        t0 = time.perf_counter()
        for _ in range(iters):
            sp.sample_caption_ids_grouped(model, cfg, params, clips, keys)
        return g * iters / (time.perf_counter() - t0)

    r1 = rate_single()
    r64 = rate_grouped(64)
    out["bleu_sample_batches_per_sec_g1"] = round(r1, 2)
    out["bleu_sample_batches_per_sec_g64"] = round(r64, 2)
    out["bleu_group_speedup"] = round(r64 / r1, 2)
    return out


def bench_samplers(model, cfg, params, batch_size: int = 64, iters: int = 20):
    """Full-size sampler latencies (ms per batched call), batch 64."""
    import time

    import jax
    import jax.numpy as jnp

    from diffusion_image_captioning_tpu import sample as sp
    from diffusion_image_captioning_tpu import schedules

    clip = jax.random.normal(
        jax.random.PRNGKey(5), (batch_size, cfg.clip_dim), jnp.float32
    )
    abar = schedules.alpha_cumprod_table(cfg)

    def timed(fn):
        out = fn(jax.random.PRNGKey(0))  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    lat = {}
    lat["refine5_ms_b64"] = round(
        timed(
            lambda k: sp.sample_captions(model, cfg, params, clip, k, steps=5)[0]
        ),
        2,
    )
    lat["ddim50_ms_b64"] = round(
        timed(
            lambda k: sp.ddim_sample(
                model, cfg, params, abar, clip, k, steps=50
            )[0]
        ),
        2,
    )
    lat["ancestral100_ms_b64"] = round(
        timed(
            lambda k: sp.ancestral_sample(
                model, cfg, params, abar, clip, k, steps=100
            )[0]
        ),
        2,
    )
    return lat


if __name__ == "__main__":
    main()
