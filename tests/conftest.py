"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Tests run on CPU so they are deterministic and fast, and so multi-chip
sharding can be validated without TPU hardware (the driver separately
dry-runs the multichip path). float64 matches the reference's default dtype
for numerical parity.

Note: this image force-registers a tunneled TPU backend via sitecustomize
(JAX_PLATFORMS=axon); the programmatic config update below overrides it —
env vars alone are not enough.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib
matplotlib.use("Agg")
