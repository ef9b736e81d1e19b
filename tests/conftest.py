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

# Persistent XLA compile cache: the suite's wall time on this 1-core host
# is dominated by CPU compiles of the frame graphs; repeat runs (and the
# driver's dryrun, which shares the cache dir) hit the cache in seconds.
# Keyed by (platform, XLA_FLAGS fingerprint) to match __graft_entry__:
# reusing entries across differing machine-feature configurations emits
# cpu_aot_loader mismatch warnings and risks SIGILL (round-4 verdict).
import hashlib  # noqa: E402

_tag = hashlib.sha1(os.environ.get("XLA_FLAGS", "").encode()).hexdigest()[:8]
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), ".jax_cache", f"cpu-{_tag}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
