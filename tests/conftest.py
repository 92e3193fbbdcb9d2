"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference has no fake-backend story (SURVEY.md section 4); ours is the
standard JAX one — force the host platform and split it into 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware.
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
