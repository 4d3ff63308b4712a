"""wedge_supervisor.sh under test (VERDICT round-3 weak #5).

The supervisor gates every long-run artifact: it drives 1-epoch segments,
kills watchdog-stalled children, caps hung segments, cools down, resumes,
and counts progress idempotently from the run log. Each behavior is driven
here as a REAL subprocess with a stub child (CHILD env) that scripts the
failure mode — the 2.5-hour false-positive hunt (runs_combined/README.md)
is what an untested supervisor costs.
"""

import os
import stat
import subprocess
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUP = os.path.join(_REPO, "scripts", "wedge_supervisor.sh")

# The stub appends one "BLEU-4 score:" per completed segment like the real
# child's run log, prints the wall line the supervisor sums, and scripts
# per-attempt behavior from a plan file: each line is the action for one
# invocation (ok | stall | hang), consumed in order.
_STUB = textwrap.dedent(
    """
    import os, sys, time
    out = sys.argv[sys.argv.index("--out") + 1]
    plan_path = os.path.join(out, "plan.txt")
    with open(plan_path) as f:
        plan = f.read().split()
    done = int(open(os.path.join(out, "calls.txt")).read()) if os.path.exists(
        os.path.join(out, "calls.txt")) else 0
    action = plan[min(done, len(plan) - 1)]
    with open(os.path.join(out, "calls.txt"), "w") as f:
        f.write(str(done + 1))
    with open(os.path.join(out, "argv.log"), "a") as f:
        f.write(" ".join(sys.argv[1:]) + "\\n")
    if action == "stall":
        print("no progress", flush=True)  # the watchdog's stderr line
        time.sleep(600)
    if action == "hang":
        time.sleep(600)  # exceeds SEG_CAP_S; killed by timeout(1)
    if action == "latewedge":
        # the worst rescue trap: fit finished AND the contractual BLEU
        # write landed, then the process died (e.g. SEG_CAP_S expiry in the
        # final save). completed() has advanced — a --bleu_only rescue here
        # would append a DUPLICATE BLEU line and over-count the protocol.
        print("[phase] pipeline fit (train+val epochs + ckpt): 1.0s"
              " (total 1.0s)", flush=True)
        ep = sys.argv[sys.argv.index("--epochs") + 1]
        os.makedirs(os.path.join(out, "epoch%s_stub.ckpt" % ep), exist_ok=True)
        with open(os.path.join(out, "epoch%s_stub.txt" % ep), "a") as f:
            f.write("BLEU-4 score: 0.1\\n")
        time.sleep(600)  # killed by SEG_CAP_S
    if action == "evalwedge":
        # fit completed (epochs checkpointed, the phase line the supervisor
        # greps for landed) but the post-fit eval leg wedged: the watchdog
        # line fires and the supervisor must kill us, then recover with a
        # --bleu_only attempt instead of a full re-train
        print("[phase] pipeline fit (train+val epochs + ckpt): 1.0s"
              " (total 1.0s)", flush=True)
        print("no progress", flush=True)
        time.sleep(600)
    # like the real child: epoch_num (= --epochs per segment) leads the
    # run-name codec, so SEG_EPOCHS=2 segments write epoch2_*.txt
    ep = sys.argv[sys.argv.index("--epochs") + 1]
    log = os.path.join(out, "epoch%s_stub.txt" % ep)
    os.makedirs(os.path.join(out, "epoch%s_stub.ckpt" % ep), exist_ok=True)
    with open(log, "a") as f:
        f.write("BLEU-4 score: 0.1\\n")
    print("wall: 2 s; log:", log)
    """
).strip()


def _run_supervisor(tmp_path, plan, epochs, extra_env=None, timeout=120):
    out = tmp_path / "out"
    out.mkdir(exist_ok=True)
    (out / "plan.txt").write_text("\n".join(plan))
    child = tmp_path / "stub_child.py"
    child.write_text(_STUB)
    child.chmod(child.stat().st_mode | stat.S_IXUSR)
    env = dict(
        os.environ,
        EPOCHS=str(epochs),
        OUT=str(out),
        CHILD=str(child),
        EXTRA="--images 1",
        POLL="1",
        COOLDOWN="1",
        SETTLE="0",
        SEG_CAP_S="5",
        STALL_S="3",
        PROBE="",  # no tunnel health probes under test (no jax, no dials)
    )
    env.update(extra_env or {})
    proc = subprocess.run(
        ["bash", _SUP],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=_REPO,
    )
    return proc, out


def test_clean_segments_complete(tmp_path):
    proc, out = _run_supervisor(tmp_path, ["ok"], epochs=3)
    assert proc.returncode == 0
    assert "complete: 3/3 epochs" in proc.stdout
    # three attempts, each logged + counted
    assert (out / "calls.txt").read_text() == "3"
    assert "sum of segment walls: 6 s" in proc.stdout


def test_watchdog_stall_killed_and_retried(tmp_path):
    proc, out = _run_supervisor(tmp_path, ["ok", "stall", "ok"], epochs=2)
    assert proc.returncode == 0
    assert "watchdog stall" in proc.stdout
    assert "stalled=1" in proc.stdout
    assert "complete: 2/2 epochs" in proc.stdout
    # the stalled attempt consumed a call without adding progress
    assert (out / "calls.txt").read_text() == "3"


def test_hung_segment_capped_and_retried(tmp_path):
    proc, out = _run_supervisor(tmp_path, ["hang", "ok"], epochs=1)
    assert proc.returncode == 0
    # timeout(1) kills at SEG_CAP_S; rc != 0 logged, then the retry lands
    assert "segment rc=" in proc.stdout
    assert "complete: 1/1 epochs" in proc.stdout
    assert (out / "calls.txt").read_text() == "2"


def test_progress_counting_is_idempotent(tmp_path):
    # pre-seed 2 completed epochs in the run log: a re-run must only drive
    # the remaining one
    out = tmp_path / "out"
    out.mkdir()
    (out / "epoch1_stub.txt").write_text("BLEU-4 score: 0.1\nBLEU-4 score: 0.1\n")
    proc, out = _run_supervisor(tmp_path, ["ok"], epochs=3)
    assert proc.returncode == 0
    assert "complete: 3/3 epochs" in proc.stdout
    assert (out / "calls.txt").read_text() == "1"
    assert "epoch 3/3" in proc.stdout


def test_resume_and_global_schedule_flags(tmp_path):
    # a fake checkpoint dir makes the supervisor pass --resume; GLOBAL_LR
    # adds the schedule position of each segment
    out = tmp_path / "out"
    out.mkdir()
    (out / "epoch1_stub.ckpt").mkdir()
    (out / "epoch1_stub.txt").write_text("BLEU-4 score: 0.1\n")
    proc, out = _run_supervisor(
        tmp_path, ["ok", "ok"], epochs=3, extra_env={"GLOBAL_LR": "1"}
    )
    assert proc.returncode == 0
    argv = (out / "argv.log").read_text().splitlines()
    assert len(argv) == 2
    assert "--resume" in argv[0]
    assert "--schedule_offset 1 --schedule_total 3" in argv[0]
    assert "--schedule_offset 2 --schedule_total 3" in argv[1]


def test_multi_epoch_segments(tmp_path):
    # SEG_EPOCHS=2: three 2-epoch segments cover 6 epochs; progress counts
    # BLEU lines x SEG_EPOCHS from epoch2_*.txt; schedule offsets advance
    # in GLOBAL epochs
    proc, out = _run_supervisor(
        tmp_path, ["ok"], epochs=6,
        extra_env={"SEG_EPOCHS": "2", "GLOBAL_LR": "1"},
    )
    assert proc.returncode == 0
    assert "complete: 6/6 epochs" in proc.stdout
    assert (out / "calls.txt").read_text() == "3"
    argv = (out / "argv.log").read_text().splitlines()
    assert "--epochs 2" in argv[0]
    assert "--schedule_offset 0 --schedule_total 6" in argv[0]
    assert "--schedule_offset 2 --schedule_total 6" in argv[1]
    assert "--schedule_offset 4 --schedule_total 6" in argv[2]
    assert "--resume" in argv[1]  # epoch2_*.ckpt from segment 1


def test_seg_epochs_must_divide_epochs(tmp_path):
    proc, _ = _run_supervisor(
        tmp_path, ["ok"], epochs=3, extra_env={"SEG_EPOCHS": "2"}
    )
    assert proc.returncode == 2
    assert "must divide evenly" in proc.stderr


def test_evalwedge_recovers_with_bleu_only(tmp_path):
    # a segment that finishes fit (ckpt saved) but wedges in the post-fit
    # eval legs must be recovered by a --bleu_only attempt, not a full
    # re-train of already-checkpointed epochs (v2 segment a2, 2026-08-20)
    proc, out = _run_supervisor(
        tmp_path, ["ok", "evalwedge", "ok", "ok"], epochs=3
    )
    assert proc.returncode == 0
    assert "complete: 3/3 epochs" in proc.stdout
    argv = (out / "argv.log").read_text().splitlines()
    assert len(argv) == 4
    assert "--bleu_only" not in argv[0] and "--bleu_only" not in argv[1]
    assert "--bleu_only" in argv[2]  # the rescue attempt
    assert "--bleu_only" not in argv[3]  # back to normal segments


def test_no_rescue_when_bleu_write_already_landed(tmp_path):
    # a segment killed AFTER its BLEU-4 write landed (SEG_CAP_S expiry in
    # the final save) advanced completed() — the next attempt must be a
    # normal segment, NOT a --bleu_only rescue that would append a
    # duplicate BLEU line and over-count the protocol (ADVICE round-4)
    proc, out = _run_supervisor(
        tmp_path, ["latewedge", "ok"], epochs=2
    )
    assert proc.returncode == 0
    assert "complete: 2/2 epochs" in proc.stdout
    argv = (out / "argv.log").read_text().splitlines()
    assert len(argv) == 2
    assert "--bleu_only" not in argv[0] and "--bleu_only" not in argv[1]
    # exactly one BLEU line per epoch — no duplicates
    log = (out / "epoch1_stub.txt").read_text()
    assert log.count("BLEU-4 score:") == 2


def test_failed_rescue_falls_back_to_retrain(tmp_path):
    # if the --bleu_only rescue itself wedges, the next attempt must NOT be
    # another rescue — it falls back to the full continue_train retry
    proc, out = _run_supervisor(
        tmp_path, ["evalwedge", "evalwedge", "ok"], epochs=1
    )
    assert proc.returncode == 0
    assert "complete: 1/1 epochs" in proc.stdout
    argv = (out / "argv.log").read_text().splitlines()
    assert len(argv) == 3
    assert "--bleu_only" not in argv[0]
    assert "--bleu_only" in argv[1]
    assert "--bleu_only" not in argv[2]


def test_relaunch_never_overwrites_prior_segment_logs(tmp_path):
    # a relaunched supervisor must continue the attempt numbering past any
    # existing segment logs, not restart at a1 over them (2026-08-20: a
    # relaunch clobbered segment_a1.log, recovered only because it was
    # committed)
    out = tmp_path / "out"
    out.mkdir()
    (out / "segment_a1.log").write_text("previous generation\n")
    (out / "segment_a3.log").write_text("previous generation\n")
    proc, out = _run_supervisor(tmp_path, ["ok"], epochs=1)
    assert proc.returncode == 0
    assert "complete: 1/1 epochs" in proc.stdout
    assert (out / "segment_a1.log").read_text() == "previous generation\n"
    assert (out / "segment_a3.log").read_text() == "previous generation\n"
    assert (out / "segment_a4.log").exists()


def test_health_probe_gates_relaunch_after_failure(tmp_path):
    # after a failed attempt the supervisor must health-probe the tunnel
    # (PROBE_CMD) until one passes before relaunching; clean attempts are
    # never probed (no extra dials on the healthy path). The stub probe
    # fails twice, then passes.
    out = tmp_path / "out"
    out.mkdir()
    probe = tmp_path / "probe.sh"
    probe.write_text(
        "#!/bin/bash\n"
        f"n=$(cat {out}/probes.txt 2>/dev/null || echo 0)\n"
        f"echo $((n + 1)) > {out}/probes.txt\n"
        "[ $n -ge 2 ]\n"
    )
    proc, out = _run_supervisor(
        tmp_path, ["stall", "ok"], epochs=1,
        extra_env={"PROBE": "1", "PROBE_CMD": f"bash {probe}"},
    )
    assert proc.returncode == 0
    assert "complete: 1/1 epochs" in proc.stdout
    assert "health probe 1 failed" in proc.stdout
    assert "health probe 2 failed" in proc.stdout
    assert (out / "probes.txt").read_text().strip() == "3"  # 2 fail + 1 pass
    assert (out / "calls.txt").read_text() == "2"


def test_stop_sentinel_exits_cleanly(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    (out / "STOP").write_text("")
    proc, _ = _run_supervisor(tmp_path, ["ok"], epochs=2)
    assert proc.returncode == 0
    assert "STOP sentinel" in proc.stdout
    assert not (out / "calls.txt").exists()  # no child ever launched
