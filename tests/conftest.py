"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Tests run on CPU so they are deterministic and so multi-chip sharding can be
validated without TPU hardware (the driver separately dry-runs the multichip
path). float64 matches the reference's default dtype for numerical parity.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_enable_x64", True)

# XLA compilation on this host is slow; persist compiled programs across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import matplotlib
matplotlib.use("Agg")
