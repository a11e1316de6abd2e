"""Test configuration: force an 8-device virtual CPU platform.

The container pre-registers the TPU via JAX_PLATFORMS=axon, so env-var
defaults are NOT enough — we must override jax's platform config after
import. Multi-chip sharding is validated on the fake 8-device CPU mesh; the
real TPU is reserved for bench.py and tests/tpu (set VIDSEG_TESTS_TPU=1 to
leave the platform alone).
"""

import os
import sys

_TPU_MODE = os.environ.get("VIDSEG_TESTS_TPU") == "1"

if not _TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # The default suite is dominated by ~60 serial XLA:CPU compiles of tiny
    # programs on a 1-core host; LLVM -O0 halves compile-bound tests
    # (43.7 -> 21.9 s on the video-UNet forward) and execution time of the
    # tiny test programs is negligible either way. Never applied to
    # tests/tpu (TPU_MODE), where compiled-kernel behavior is under test.
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

# repo root on sys.path so `import vidseg_diffusion_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert _TPU_MODE or jax.default_backend() == "cpu", jax.default_backend()
