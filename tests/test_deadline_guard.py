"""deadline_guard.sh under test (VERDICT round-4 next #1b).

Round 4's queue promised a TPU deadline and never enforced it — the
driver's round-end bench ran against a busy box and BENCH_r04.json came
back rc=124/parsed=null. The guard is the enforcement path for the round's
contractual artifact, so like wedge_supervisor.sh it runs here as a REAL
subprocess: a stub long-running child (setsid, pid file — exactly how the
supervisor exposes its children) must be STOP-sentineled at T-GRACE_S,
killed as a process group at T, and the quiet verdict written as JSON.
"""

import json
import os
import subprocess
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GUARD = os.path.join(_REPO, "scripts", "deadline_guard.sh")


def _run_guard(tmp_path, deadline_in_s, grace_s, pid_globs, timeout=60,
               extra_env=None):
    env = dict(
        os.environ,
        DEADLINE_TS=str(int(time.time()) + deadline_in_s),
        GRACE_S=str(grace_s),
        STOP_FILES=str(tmp_path / "jobA" / "STOP") + " " + str(
            tmp_path / "jobB" / "STOP"),
        PID_GLOBS=pid_globs,
        REPORT=str(tmp_path / "quiet.json"),
        QUIET_SAMPLE_S="1",
        POLL="1",
    )
    env.update(extra_env or {})
    return subprocess.run(
        ["bash", _GUARD],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=_REPO,
    )


def _spawn_stub_job(tmp_path, name):
    """A supervisor-shaped child: its own session (setsid), pid on disk."""
    out = tmp_path / name
    out.mkdir(exist_ok=True)
    proc = subprocess.Popen(
        ["sleep", "300"], start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    (out / "segment.pid").write_text(str(proc.pid))
    return proc, out


def test_stop_then_kill_then_quiet(tmp_path):
    proc_a, out_a = _spawn_stub_job(tmp_path, "jobA")
    try:
        res = _run_guard(
            tmp_path, deadline_in_s=4, grace_s=2,
            pid_globs=str(out_a / "segment.pid"),
        )
        assert res.returncode == 0, res.stdout + res.stderr
        # graceful phase ran first: sentinel dropped before the kill
        assert (out_a / "STOP").exists()
        assert "STOP sentinels dropped" in res.stdout
        # the job group was killed and is gone
        assert f"killed pg {proc_a.pid}" in res.stdout
        assert proc_a.wait(timeout=10) != 0
        report = json.loads((tmp_path / "quiet.json").read_text())
        assert report["quiet"] is True
        assert report["survivors"] == []
        assert proc_a.pid in report["killed"]
        assert isinstance(report["lo_bytes_delta_1s"], int)
    finally:
        if proc_a.poll() is None:
            proc_a.kill()


def test_multiple_pid_globs_and_stale_pids(tmp_path):
    # one live job + one stale pid file (process already gone) + one glob
    # matching nothing: the guard must kill the live one, ignore the rest,
    # and still report quiet
    proc_a, out_a = _spawn_stub_job(tmp_path, "jobA")
    out_b = tmp_path / "jobB"
    out_b.mkdir()
    (out_b / "segment.pid").write_text("999999")  # beyond pid_max default
    try:
        res = _run_guard(
            tmp_path, deadline_in_s=3, grace_s=1,
            pid_globs=" ".join([
                str(tmp_path / "*" / "segment.pid"),
                str(tmp_path / "nothing" / "*.pid"),
            ]),
        )
        assert res.returncode == 0, res.stdout + res.stderr
        report = json.loads((tmp_path / "quiet.json").read_text())
        assert report["quiet"] is True
        assert report["killed"] == [proc_a.pid]
    finally:
        if proc_a.poll() is None:
            proc_a.kill()


def test_past_deadline_kills_immediately(tmp_path):
    # launched late (deadline already behind us): no waiting, straight to
    # sentinel + kill — the guard must still converge to a quiet box
    proc_a, out_a = _spawn_stub_job(tmp_path, "jobA")
    try:
        t0 = time.time()
        res = _run_guard(
            tmp_path, deadline_in_s=-30, grace_s=10,
            pid_globs=str(out_a / "segment.pid"),
        )
        assert res.returncode == 0, res.stdout + res.stderr
        assert time.time() - t0 < 30
        assert (out_a / "STOP").exists()
        assert proc_a.wait(timeout=10) != 0
    finally:
        if proc_a.poll() is None:
            proc_a.kill()


def test_quiet_box_reports_quiet_without_kills(tmp_path):
    (tmp_path / "jobA").mkdir()
    res = _run_guard(tmp_path, deadline_in_s=2, grace_s=1,
                     pid_globs=str(tmp_path / "jobA" / "segment.pid"))
    assert res.returncode == 0, res.stdout + res.stderr
    report = json.loads((tmp_path / "quiet.json").read_text())
    assert report["quiet"] is True
    assert report["killed"] == []
    assert "killed pg" not in res.stdout
