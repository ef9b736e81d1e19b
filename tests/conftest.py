"""Test configuration: run everything on a simulated 8-device CPU mesh.

The reference has no tests at all (SURVEY.md section 4); this suite is the
rebuild's verification story. Tests run on CPU for determinism and so that
multi-chip sharding paths can be exercised without TPU hardware, via
xla_force_host_platform_device_count (SURVEY.md section 4 note).

Note: this environment's sitecustomize imports jax and registers the TPU
backend at interpreter start, so plain env-var overrides are too late --
jax.config.update is required to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
