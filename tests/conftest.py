"""Test harness config: force a hermetic 8-device CPU JAX platform.

Multi-chip sharding paths are exercised on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the
driver dry-runs the multi-chip path. The environment may pre-register a
remote TPU backend and set jax_platforms via jax.config at interpreter
start, so we must override through jax.config (env vars alone are too late).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
