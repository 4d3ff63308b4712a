"""stale_log_guard.sh under test.

The in-process StallWatchdog covers only the train/val loops; a tunnel
wedge BEFORE its first poke (observed 2026-08-22 06:55, cosine 15-ep
segment a2: log silent straight after the restore leg, box idle, loopback
flat) leaves the segment to the 3000 s SEG_CAP timeout. The stale-log
guard bounds that class by watching the newest segment_a*.log mtime, so —
like the supervisor and deadline guard — it is tested as a REAL
subprocess against stub children shaped exactly like the supervisor's
(setsid process group, pid file on disk).
"""

import os
import subprocess
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GUARD = os.path.join(_REPO, "scripts", "stale_log_guard.sh")


def _spawn_stub(tmp_path, name, log_age_s):
    """Supervisor-shaped child: own session, pid file, one segment log."""
    out = tmp_path / name
    out.mkdir(exist_ok=True)
    proc = subprocess.Popen(
        ["sleep", "300"], start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    (out / "segment.pid").write_text(str(proc.pid))
    seglog = out / "segment_a1.log"
    seglog.write_text("phase init\n")
    old = time.time() - log_age_s
    os.utime(seglog, (old, old))
    return proc, out


def _run_guard(dirs, match, run_s=8, stall_s=5):
    env = dict(
        os.environ,
        DIRS=" ".join(str(d) for d in dirs),
        STALL_WRITE_S=str(stall_s),
        POLL="1",
        END_TS=str(int(time.time()) + run_s),
        MATCH=match,
    )
    return subprocess.run(
        ["bash", _GUARD], capture_output=True, text=True,
        timeout=run_s + 30, env=env, cwd=_REPO,
    )


def _alive(proc):
    return proc.poll() is None


def test_kills_stale_matching_group(tmp_path):
    proc, out = _spawn_stub(tmp_path, "wedged", log_age_s=100)
    try:
        res = _run_guard([out], match="sleep")
        assert res.returncode == 0, res.stdout + res.stderr
        assert "killing pg" in res.stdout
        time.sleep(0.2)
        assert not _alive(proc), "stale-logged group should be killed"
    finally:
        if _alive(proc):
            proc.kill()


def test_spares_fresh_log(tmp_path):
    proc, out = _spawn_stub(tmp_path, "healthy", log_age_s=0)
    try:
        # stall_s > run_s: the untouched log can never age past the
        # threshold while the guard is running.
        res = _run_guard([out], match="sleep", run_s=4, stall_s=30)
        assert res.returncode == 0, res.stdout + res.stderr
        assert "killing pg" not in res.stdout
        assert _alive(proc), "fresh-logged group must survive"
    finally:
        proc.kill()


def test_spares_nonmatching_cmdline(tmp_path):
    # Pid-recycling safety: stale log but the pid's cmdline does not match
    # MATCH (here the real default) — the guard must not touch it.
    proc, out = _spawn_stub(tmp_path, "recycled", log_age_s=100)
    try:
        res = _run_guard([out], match="run_correlated_world")
        assert res.returncode == 0, res.stdout + res.stderr
        assert "killing pg" not in res.stdout
        assert _alive(proc), "non-matching cmdline must never be killed"
    finally:
        proc.kill()
