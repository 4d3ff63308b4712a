"""run_trial_grid.sh drives one wedge-supervised arm per ablation axis.

Same stub-child pattern as tests/test_wedge_supervisor.py: the grid script
only orchestrates (arm -> flags -> supervisor -> DONE marker), so the test
checks idempotence, flag wiring, and the STOP sentinel without any jax.
"""

import os
import subprocess

from tests.test_wedge_supervisor import _STUB

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GRID = os.path.join(_REPO, "scripts", "run_trial_grid.sh")


def _run_grid(tmp_path, arms, epochs=2, extra_env=None, pre=None):
    grid_out = tmp_path / "grid"
    grid_out.mkdir(exist_ok=True)
    child = tmp_path / "stub_child.py"
    child.write_text(_STUB)
    for arm in arms.split():
        arm_dir = grid_out / arm
        arm_dir.mkdir(exist_ok=True)
        (arm_dir / "plan.txt").write_text("ok")
    if pre:
        pre(grid_out)
    env = dict(
        os.environ,
        GRID_OUT=str(grid_out),
        ARMS=arms,
        EPOCHS=str(epochs),
        SEG_EPOCHS="1",
        CHILD=str(child),
        POLL="1",
        COOLDOWN="1",
        SETTLE="0",
        SEG_CAP_S="5",
        STALL_S="3",
    )
    env.update(extra_env or {})
    proc = subprocess.run(
        ["bash", _GRID],
        capture_output=True, text=True, timeout=120, env=env, cwd=_REPO,
    )
    return proc, grid_out


def test_arms_complete_with_flags_and_done_markers(tmp_path):
    proc, out = _run_grid(tmp_path, "baseline add", epochs=2)
    assert proc.returncode == 0, proc.stderr
    assert (out / "baseline" / "DONE").exists()
    assert (out / "add" / "DONE").exists()
    assert "done: 2 arms finished" in proc.stdout
    # per-arm flags reach the child; schedule-correct segments are on
    argv_add = (out / "add" / "argv.log").read_text()
    assert "--fusion add" in argv_add
    assert "--schedule_total 2" in argv_add
    argv_base = (out / "baseline" / "argv.log").read_text()
    assert "--fusion" not in argv_base


def test_grid_is_idempotent(tmp_path):
    def pre(grid_out):
        (grid_out / "baseline" / "DONE").write_text("")

    proc, out = _run_grid(tmp_path, "baseline add", epochs=2, pre=pre)
    assert proc.returncode == 0, proc.stderr
    assert "arm baseline already DONE" in proc.stdout
    assert not (out / "baseline" / "argv.log").exists()  # never re-driven
    assert (out / "add" / "DONE").exists()


def test_stop_sentinel_halts_between_arms(tmp_path):
    def pre(grid_out):
        (grid_out / "STOP").write_text("")

    proc, out = _run_grid(tmp_path, "baseline", epochs=1, pre=pre)
    assert proc.returncode == 0
    assert "STOP sentinel" in proc.stdout
    assert not (out / "baseline" / "DONE").exists()


def test_unknown_arm_fails_loudly(tmp_path):
    proc, _ = _run_grid(tmp_path, "nonsense", epochs=1)
    assert proc.returncode == 2
    assert "unknown arm" in proc.stderr
