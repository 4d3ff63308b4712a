"""Test harness setup.

All tests run on CPU with a virtual 8-device mesh so multi-chip sharding
logic (shard_map / pjit over a Mesh) is exercised without TPU hardware,
mirroring the reference's absence of any test suite with a real suite
(SURVEY.md section 4).

Environment subtlety: a sitecustomize hook on PYTHONPATH imports jax and
registers the TPU-tunnel backend at interpreter startup, freezing
``jax_platforms`` from the environment before any test code runs. Setting
``JAX_PLATFORMS`` here is therefore too late — but the backend itself is
not initialized until first use, so ``jax.config.update("jax_platforms")``
still wins, and XLA_FLAGS (read at backend init) can still be set.

The host has a single CPU core and XLA:CPU compiles are expensive, so the
JAX persistent compilation cache is enabled: the first full-suite run pays
the compile cost once; subsequent runs hit the cache.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()
