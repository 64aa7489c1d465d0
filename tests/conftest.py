"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on host-platform virtual devices instead (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

The machine's sitecustomize imports jax (via axon.register) at EVERY
interpreter start, so env-var scrubbing here is too late to stop the
import — but the backend is still chosen lazily, so overriding
jax.config before the first device use forces the CPU mesh.
"""

import os

os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402 (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; jax was initialized before "
    "conftest could override the platform"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
