"""Test configuration: CPU backend with 8 virtual devices, float64.

All numerical verification runs on the CPU backend in float64 (matching the
reference's tolerances); multi-device sharding tests use the 8 virtual CPU
devices. The TPU path is exercised by bench.py / __graft_entry__.py.

On this host, importing pytest already imports jax (axon site hooks), so
environment variables are latched before conftest runs; the jax.config API
still works as long as no backend has been initialized yet.
"""
import os

os.environ.setdefault("CMAD_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", True)
