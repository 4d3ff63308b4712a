"""Test harness setup.

All tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
(shard_map / pjit over a Mesh) is exercised without TPU hardware, mirroring the
reference's absence of any test suite with a real suite (SURVEY.md section 4).
Must run before the first `import jax` anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
