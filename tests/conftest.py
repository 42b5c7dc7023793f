"""Test harness: run everything on XLA-CPU with an 8-device virtual mesh.

Mirrors SURVEY.md §4's "fake backend" plan: sharding/vmap tests need no
TPU; the driver separately validates the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start and pins the
# platform before this file runs; override via the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
