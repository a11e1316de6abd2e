"""Packed injected-slice streaming (engine/vidseg._pack_step_slices):
one contiguous H2D buffer per step instead of one device_put per harvest
entry — per-entry puts serialize against queued compute dispatches through
the tunneled runtime and stop overlapping (host_stream_bench r4)."""

import numpy as np
import jax.numpy as jnp

from vidseg_diffusion_tpu.engine.vidseg import (
    _pack_step_slices,
    _unpack_step_slices,
)


def _host_cache(dtype=np.float32):
    rs = np.random.RandomState(0)
    return {
        "output_3_spatial_self_q": rs.rand(4, 6, 64, 32).astype(dtype),
        "output_3_spatial_self_k": rs.rand(4, 6, 64, 32).astype(dtype),
        "output_5_temporal_self_q": rs.rand(4, 12, 3, 16).astype(dtype),
    }


def test_pack_unpack_roundtrip():
    host = _host_cache()
    for idx in (0, 3):
        flat, layout = _pack_step_slices(host, idx)
        assert flat.ndim == 1
        assert flat.size == sum(a[idx].size for a in host.values())
        out = _unpack_step_slices(jnp.asarray(flat), layout)
        assert set(out) == set(host)
        for name, arr in host.items():
            np.testing.assert_array_equal(np.asarray(out[name]), arr[idx])


def test_layout_is_static_hashable():
    flat, layout = _pack_step_slices(_host_cache(), 1)
    # layout is a jit static argument: must be hashable and deterministic
    assert hash(layout) == hash(_pack_step_slices(_host_cache(), 2)[1])


def test_mixed_dtype_falls_back():
    host = _host_cache()
    host["odd"] = np.zeros((4, 2, 2), np.float16)
    assert _pack_step_slices(host, 0) is None
