"""Test harness: force an 8-virtual-device CPU platform (SURVEY §4 — the
CPU-simulated multi-device substitute for the reference's Go race tests)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
