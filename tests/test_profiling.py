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
