"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §7) so
sharding tests validate multi-chip logic without TPU pods.

NOTE: pytest plugins import jax before this conftest runs, so setting
JAX_PLATFORMS via os.environ is too late — use jax.config.update instead
(the backend itself is still initialized lazily)."""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("CSDR_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
