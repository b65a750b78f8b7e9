"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device virtualization (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the axon TPU plugin in this image force-registers itself regardless of
JAX_PLATFORMS, so the platform must be pinned via jax.config *before* any
backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
