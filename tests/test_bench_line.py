"""The driver-parsed bench stdout contract (VERDICT round-3 next #1).

The driver tails ``python bench.py`` stdout and json-parses the LAST line;
round 3 lost its perf number because that line had grown past the capture
(BENCH_r03.json parsed:null). These tests pin the fixed contract: a compact
final line under ``bench.MAX_FINAL_LINE_BYTES`` pointing at an extras file
that carries everything else. Pure host-side — no jax, no device.
"""

import importlib.util
import json
import os

# ``import bench`` resolves to the bench/ package (probe suite), not the
# repo-root bench.py — load the script by path like bench.py itself loads
# combined_summary.
_spec = importlib.util.spec_from_file_location(
    "_bench_script",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _fat_extras():
    return {
        "dp8_projection": {("k%d" % i): i * 1.5 for i in range(40)},
        "eval_leg": {"val_loss_batches_per_sec": 58.01},
        "trial_grid": {"arms": {("arm%d" % i): {"bleu": 0.1 + i} for i in range(30)}},
        "notes": "x" * 4000,
    }


def test_final_line_is_compact_and_parseable():
    compact = {
        "metric": "train_steps_per_sec_flagship",
        "value": 19.9364,
        "unit": "optimizer steps/s (effective batch 800, DistilBERT-base denoiser)",
        "vs_baseline": 5.914,
        "matmul_mfu_pct": 49.8,
        "sampler_ancestral100_ms_b64": 96.47,
        "combined_vs_a30": 3.21,
    }
    line = bench.final_line(compact, "runs/bench_extras.json")
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES
    d = json.loads(line)
    # The driver's minimum: metric/value/vs_baseline, plus the round-3
    # verdict's required perf fields and the extras pointer.
    assert d["metric"] == "train_steps_per_sec_flagship"
    assert d["value"] == 19.9364
    assert d["vs_baseline"] == 5.914
    assert d["matmul_mfu_pct"] == 49.8
    assert d["extras_file"] == "runs/bench_extras.json"
    assert "\n" not in line


def test_final_line_drops_optional_keys_to_fit():
    compact = {
        "metric": "train_steps_per_sec_flagship",
        "value": 19.9364,
        "unit": "y" * 600,  # pathological: would overflow the cap alone
        "vs_baseline": 5.914,
        "matmul_mfu_pct": 49.8,
        "sampler_ancestral100_ms_b64": 96.47,
        "combined_vs_a30": 3.21,
    }
    line = bench.final_line(compact, "runs/bench_extras.json")
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES
    d = json.loads(line)
    # Headline fields survive; the oversized optional field was shed.
    assert d["value"] == 19.9364 and d["vs_baseline"] == 5.914
    assert "unit" not in d


def test_write_extras_roundtrip(tmp_path, monkeypatch):
    target = tmp_path / "extras.json"
    monkeypatch.setenv("BENCH_EXTRAS_FILE", str(target))
    payload = {"metric": "m", "value": 1.0, "extras": _fat_extras()}
    # json round-trip needs string keys like the real blob has
    payload["extras"]["dp8_projection"] = {
        str(k): v for k, v in payload["extras"]["dp8_projection"].items()
    }
    rel = bench.write_extras(payload)
    assert rel == str(target)
    with open(target) as f:
        back = json.load(f)
    assert back["value"] == 1.0
    assert back["extras"]["notes"] == "x" * 4000


def test_parity_lines_derive_v21_byte_identity():
    # The committed v2.1 A/B artifacts ARE byte-identical over the shared
    # prefix — the derivation (which replaced a hardcoded True, ADVICE
    # round-3) must find exactly that on the real logs.
    a = bench._parity_lines("runs_combined_v21")
    b = bench._parity_lines("runs_combined_v2")
    if not a or not b:  # artifact dirs absent in a stripped checkout
        return
    n = min(len(a), len(b))
    assert n >= 4
    assert a[:n] == b[:n]
