"""StepTimer semantics — especially drain(), which exists because plain
ticks around async jax dispatch measure host ENQUEUE rate, not device
step rate (a checked-in run log recorded 228 'steps/s' for a ~20 steps/s
run before the fix)."""

import time

import jax.numpy as jnp

from diffusion_image_captioning_tpu.utils.profiling import StepTimer


def test_tick_skips_warmup_and_counts():
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.tick()
    # 4 ticks = 3 intervals, first skipped as warmup
    assert t.count == 3
    assert t.steps_per_sec > 0


def test_drain_charges_pending_wait():
    t = StepTimer(warmup=0)
    t.tick()
    time.sleep(0.02)
    t.tick()  # interval ~20 ms recorded
    fast = t.steps_per_sec
    time.sleep(0.05)  # queued "device work" draining after the last tick
    t.drain(jnp.zeros(()))  # charges the 50 ms without counting a step
    assert t.count == 1
    assert t.steps_per_sec < fast
    assert t.total >= 0.06


def test_drain_then_new_epoch_starts_fresh():
    t = StepTimer(warmup=0)
    t.tick()
    t.tick()
    t.drain(None)
    before = t.total
    time.sleep(0.02)  # between-epoch time must NOT be charged
    t.tick()
    assert t.total == before


class TestStallWatchdog:
    def test_fires_on_stall_and_stays_quiet_when_poked(self):
        from diffusion_image_captioning_tpu.utils.profiling import StallWatchdog
        import time

        msgs = []
        wd = StallWatchdog(timeout_s=0.2, label="t", emit=msgs.append).start()
        try:
            # poked -> quiet
            for _ in range(4):
                wd.poke()
                time.sleep(0.06)
            assert msgs == []
            # stalled -> fires (and re-fires once per further timeout)
            time.sleep(0.8)
            assert len(msgs) >= 1
            assert "no progress" in msgs[0]
        finally:
            wd.stop()
        n = len(msgs)
        time.sleep(0.3)
        assert len(msgs) == n  # stopped: no further emissions

    def test_disabled_is_noop(self):
        from diffusion_image_captioning_tpu.utils.profiling import StallWatchdog

        wd = StallWatchdog(timeout_s=0).start()
        assert wd._thread is None
        wd.stop()
