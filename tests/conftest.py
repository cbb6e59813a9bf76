"""Test configuration: force an 8-device virtual CPU platform BEFORE the jax
backend initializes, so sharding/pjit paths are exercised without TPU
hardware (the TPU-world analog of multi-node tests without a cluster —
SURVEY.md §4).

Note: this environment registers an `axon` TPU-tunnel backend via
sitecustomize and pins JAX_PLATFORMS=axon; the env var alone is not enough,
so we override through jax.config (which wins over the env)."""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Repo root on sys.path so `import vitslam_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
