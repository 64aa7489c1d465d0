"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on host-platform virtual devices instead (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before jax initializes — and the axon TPU plugin ignores
JAX_PLATFORMS, so its env hooks are removed explicitly.
"""

import os

for var in ("AXON_LOOPBACK_RELAY", "PALLAS_AXON_TPU_GEN",
            "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
    os.environ.pop(var, None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
