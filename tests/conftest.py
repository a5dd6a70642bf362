"""Test configuration: force all tests onto a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware (and so
the suite doesn't contend for the single real TPU tunnel — the outer
environment pins JAX_PLATFORMS=axon, hence the hard override).

Uses the jax.config API rather than XLA_FLAGS: on this box the
--xla_force_host_platform_device_count env path interacts badly with the
axon PJRT plugin (hangs at backend init), while jax_num_cpu_devices works.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to the env-var mechanism
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
