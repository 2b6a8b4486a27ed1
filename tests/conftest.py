"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh
(``xla_force_host_platform_device_count``) since tests may run without TPU
hardware; the driver separately dry-runs the multi-chip path.

NOTE: the session environment may pin JAX_PLATFORMS to a TPU plugin that
ignores a later env override, so the platform is forced through jax.config
as well (before any backend initializes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
