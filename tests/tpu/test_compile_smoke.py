"""Bench-step compile smoke: no dispatcher edit may reach the driver uncompiled.

BENCH_r03 crashed at compile time — the small-batched attention kernel's
scoped-VMEM demand exceeded the in-context limit at one swan shape, and
nothing between "dispatcher edit" and "driver runs bench.py" ever compiled
the program on hardware. This test closes that hole:

1. traces the EXACT bench step (bench.build_bench_step — the same function
   bench.py times) with the kernel-dispatch log enabled, enumerating every
   Pallas kernel the program dispatches at swan 832x448;
2. AOT-compiles each dispatched kernel standalone on the TPU. With
   vmem_limit_bytes pinned per kernel (ops/attention._KERNEL_VMEM_LIMIT) the
   standalone scoped-vmem limit equals the in-context one, so a standalone
   PASS is meaningful (pre-r4, standalone compiles ran under a looser
   context-dependent default limit and could not catch the r3 crash —
   scripts/tests/sba_vmem_probe.py documents that);
3. with VIDSEG_SMOKE_FULL=1, also AOT-compiles the full step program (what
   bench.py will run; primes the persistent compilation cache).

Run with: VIDSEG_TESTS_TPU=1 python -m pytest tests/tpu/test_compile_smoke.py -q
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops import attention as A
from vidseg_diffusion_tpu.ops import matmul as M
from vidseg_diffusion_tpu.ops import temporal_conv as TC

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(__file__))))


@pytest.fixture(scope="module")
def bench_dispatches():
    """Trace the bench step with the dispatch log on; return (log, lowered)."""
    import bench

    step, params, x, _ = bench.build_bench_step()
    A.DISPATCH_LOG = log = []
    try:
        lowered = jax.jit(step).lower(params, x)
    finally:
        A.DISPATCH_LOG = None
    return log, lowered


def test_bench_step_dispatches_expected_kernels(bench_dispatches):
    log, _ = bench_dispatches
    kinds = {e["kind"] for e in log}
    # the swan bench step must use the folded temporal kernel and the packed
    # spatial flash kernel; the projection matmul kernel only when opted in
    # (default OFF — measured 31 ms/step slower in-model, ops/matmul.py)
    assert "small_batched" in kinds, log
    assert "flash_packed" in kinds, log
    if os.environ.get("VIDSEG_PALLAS_MATMUL") == "1":
        assert "matmul_bias" in kinds, log
    else:
        assert "matmul_bias" not in kinds, log


def test_every_dispatched_kernel_compiles_standalone(bench_dispatches):
    log, _ = bench_dispatches
    seen = set()
    for e in log:
        key = tuple(sorted(e.items()))
        if key in seen:
            continue
        seen.add(key)
        dt = jnp.bfloat16 if "bfloat16" in e.get("dtype", "") else jnp.float32
        if e["kind"] == "small_batched":
            q = jax.ShapeDtypeStruct((e["b"], e["lq"], e["h"], e["d"]), dt)
            k = jax.ShapeDtypeStruct((e["b"], e["lk"], e["h"], e["d"]), dt)
            jax.jit(
                lambda q, k, v, fold=e["fold"]:
                A._small_batched_attention_impl(q, k, v, fold=fold)
            ).lower(q, k, k).compile()
        elif e["kind"] == "flash_packed":
            q = jax.ShapeDtypeStruct((e["b"], e["lq"], e["h"] * e["d"]), dt)
            k = jax.ShapeDtypeStruct((e["b"], e["lk"], e["h"] * e["d"]), dt)
            jax.jit(
                lambda q, k, v, h=e["h"]:
                A._flash_attention_packed_impl(q, k, v, heads=h)
            ).lower(q, k, k).compile()
        elif e["kind"] == "matmul_bias":
            x = jax.ShapeDtypeStruct((e["m"], e["k"]), dt)
            w = jax.ShapeDtypeStruct((e["k"], e["n"]), dt)
            b = jax.ShapeDtypeStruct((e["n"],), dt)
            jax.jit(M._matmul_bias_impl).lower(x, w, b).compile()
        elif e["kind"] == "temporal_conv":
            x = jax.ShapeDtypeStruct((e["b"], e["t"], e["m"], e["cin"]), dt)
            w = jax.ShapeDtypeStruct((e["kt"], e["cin"], e["cout"]), dt)
            b = jax.ShapeDtypeStruct((e["cout"],), dt)
            jax.jit(TC._temporal_conv_impl).lower(x, w, b).compile()
    assert seen, "dispatch log was empty"


@pytest.mark.skipif(
    os.environ.get("VIDSEG_SMOKE_FULL") != "1",
    reason="full-program AOT compile is a 10-60 min build; set VIDSEG_SMOKE_FULL=1",
)
def test_full_bench_step_compiles(bench_dispatches):
    _, lowered = bench_dispatches
    lowered.compile()
