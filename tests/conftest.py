"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a fake 8-device CPU mesh (the standard
JAX fake-multihost trick); the real TPU is reserved for bench.py. These env
vars must be set before jax initializes, hence module-level in conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `import vidseg_diffusion_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
