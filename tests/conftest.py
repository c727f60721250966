"""Test configuration: force CPU with 8 virtual devices.

Distributed tests exercise shard_map/pjit over an 8-device CPU mesh — the
standard JAX way to test multi-chip sharding without hardware (SURVEY.md §4.4).

Note: the session sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (one real TPU), so env vars alone are too late here —
we must go through jax.config.update before any backend is initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: XLA_FLAGS fallback above covers it
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() >= 8, jax.devices()
