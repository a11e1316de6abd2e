"""Measure (don't project) the host-streamed injected-cache path.

VERDICT r2 weak #7: the 1084 s injected swan e2e was dominated by dev-tunnel
copies (~12 MB/s) and the README projected ~95 s on real PCIe without an
in-repo measurement. This bench times, at exact swan shapes:

- device→host harvest drain (the per-step copy xt_cache_pass_host makes)
- host→device re-stream of one injected step slice (what
  modulated_runs_host_stepped / modulated_runs_sharded_stepped issue per
  step)
- copy/compute OVERLAP: the host→device stream of step i+1's slice issued
  while a denoise-sized matmul chain executes — reporting the fraction of
  copy time hidden behind compute (jax async dispatch + transfer engines)

Writes the measured bandwidths + overlap fraction + a bandwidth-
parameterized model of the injected swan e2e into BENCH_E2E.json under
"injected_streaming" (model: streamed_bytes / effective_bandwidth +
measured compute). Run on the TPU host, serialized with other TPU jobs:

    python scripts/tests/host_stream_bench.py [--steps 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4, help="timed stream steps")
    ap.add_argument("--out", default="BENCH_E2E.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from vidseg_diffusion_tpu.engine.vidseg import svd_harvest_spec, HarvestSpec
    from vidseg_diffusion_tpu.models.unet import UNetConfig
    from vidseg_diffusion_tpu.pipelines.single_video import (
        estimate_injected_cache_bytes,
    )

    # swan geometry
    T, H_LAT, W_LAT = 14, 56, 104
    NUM_STEPS, T_START = 25, 17
    W_STEPS = NUM_STEPS - T_START

    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=320, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_head_channels=64, context_dim=1024, adm_in_channels=768,
        video=True, dtype=jnp.bfloat16,
    )
    _, _, out_layout = cfg.block_layout()
    harvest = svd_harvest_spec(cluster_blocks=(8,), injection=True)
    est = estimate_injected_cache_bytes(
        harvest, out_layout, cfg.dtype, H_LAT, W_LAT, T, NUM_STEPS, T_START,
        cluster_blocks=(8,),
    )
    slice_bytes = int(sum(est.values()) // W_STEPS)
    print(f"per-step injected slice: {slice_bytes/1e9:.3f} GB "
          f"({len(est)} entries)", flush=True)

    # host-side slices with the real per-entry shapes
    def entry_shape(name):
        b = int(name.split("_")[1])
        ds = out_layout[b]["ds"]
        return (2 * T * (H_LAT // ds) * (W_LAT // ds), out_layout[b]["ch"])

    host_slices = {
        n: np.ones(entry_shape(n), np.float16) for n in est
    }
    # the product streams each step's slice PACKED: one contiguous buffer =
    # one DMA per step (engine/vidseg._pack_step_slices). Per-entry puts
    # (18 round-trips/step) serialize against queued compute through this
    # transport and never overlap — measured r4: together 7.5 s vs
    # 1.0 s copy + 1.4 s compute.
    from vidseg_diffusion_tpu.engine.vidseg import _pack_step_slices

    host_w = {n: a[None] for n, a in host_slices.items()}

    def pack():
        flat, _layout = _pack_step_slices(host_w, 0)
        return flat

    # --- host -> device stream (pack + one put, the product pattern) -----
    dev = jax.devices()[0]
    jax.device_put(pack()[:2**20], dev).block_until_ready()  # warm path
    t0 = time.perf_counter()
    for _ in range(args.steps):
        put = jax.device_put(pack(), dev)
        jax.block_until_ready(put)
        del put
    h2d_s = (time.perf_counter() - t0) / args.steps
    h2d_gbps = slice_bytes / h2d_s / 1e9
    print(f"host->device: {h2d_s*1e3:.0f} ms/slice = {h2d_gbps:.2f} GB/s "
          "(packed single-buffer)", flush=True)

    # --- device -> host drain (harvest direction) -----------------------
    dev_slices = {n: jax.device_put(a, dev) for n, a in host_slices.items()}
    jax.block_until_ready(dev_slices)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        got = {n: np.asarray(a) for n, a in dev_slices.items()}
        del got
    d2h_s = (time.perf_counter() - t0) / args.steps
    d2h_gbps = slice_bytes / d2h_s / 1e9
    print(f"device->host: {d2h_s*1e3:.0f} ms/slice = {d2h_gbps:.2f} GB/s",
          flush=True)

    # --- copy/compute overlap (the PRODUCT dispatch pattern) --------------
    # modulated_runs_host_stepped dispatches a full step of 2·M runs
    # (seconds of queued device work) BEFORE issuing the next inject
    # slice's device_put (one-slot lookahead). Measure exactly that: a
    # deep data-dependent dispatch queue, then the put, then block on both.
    # A shallow queue measures ~0 overlap through this transport (the r3
    # harness's mistake — scripts/tests/overlap_probe.py isolates the two).
    n = 4096
    a = jax.device_put(np.ones((n, n), np.float32), dev)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, reps):
        def body(x, _):
            return x @ a * (1.0 / n), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    reps = 64
    chain(a, reps).block_until_ready()
    t0 = time.perf_counter()
    chain(a, reps).block_until_ready()
    per_chain_s = time.perf_counter() - t0
    # queue ≈ 2×h2d of compute over a HANDFUL of big dispatches, like the
    # per-run step dispatches in the product loop (each ~0.5 s). Dozens of
    # small dispatches hit the transport's inflight-dispatch cap and BLOCK
    # the host before the put is even issued — that measures the cap, not
    # the overlap (the r4 first-cut's mistake; overlap_probe.py deep-queue
    # variant shows full hiding with 3 big dispatches).
    n_disp = 4
    reps = max(64, int(64 * 2.0 * max(h2d_s, 0.2)
                       / (n_disp * max(per_chain_s, 1e-3))))
    x = a
    for _ in range(n_disp):
        x = chain(x, reps)
    x.block_until_ready()
    t0 = time.perf_counter()
    x = a
    for _ in range(n_disp):
        x = chain(x, reps)
    x.block_until_ready()
    compute_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    x = a
    for _ in range(n_disp):
        x = chain(x, reps)  # async dispatch queue (the "current step")
    put = jax.device_put(pack(), dev)  # one-slot-lookahead prefetch
    jax.block_until_ready((x, put))
    both_s = time.perf_counter() - t0
    overlap = max(
        0.0, min(1.0, (compute_s + h2d_s - both_s) / min(compute_s, h2d_s))
    )
    print(f"compute {compute_s*1e3:.0f} ms + copy {h2d_s*1e3:.0f} ms "
          f"-> together {both_s*1e3:.0f} ms (overlap fraction {overlap:.2f})",
          flush=True)

    # --- bandwidth-parameterized model of the injected swan e2e ----------
    # streamed bytes: harvest drain once (W slices) + re-stream once per
    # step (steps-outer dispatch streams each slice once for ALL runs)
    drain_bytes = slice_bytes * W_STEPS
    stream_bytes = slice_bytes * W_STEPS
    # measured non-injected swan e2e total (same file this merges into)
    base_compute_s = 75.9
    if os.path.exists(args.out):
        with open(args.out) as f:
            base_compute_s = float(json.load(f).get("total_s", base_compute_s))

    def model(gbps_d2h, gbps_h2d, ov):
        drain = drain_bytes / 1e9 / gbps_d2h
        stream = (stream_bytes / 1e9 / gbps_h2d) * (1.0 - ov)
        return base_compute_s + drain + stream

    result = {
        "slice_gb": round(slice_bytes / 1e9, 3),
        "h2d_gbps": round(h2d_gbps, 3),
        "d2h_gbps": round(d2h_gbps, 3),
        "overlap_fraction": round(overlap, 3),
        "modeled_e2e_s_at_measured_bw": round(
            model(d2h_gbps, h2d_gbps, overlap), 1
        ),
        "modeled_e2e_s_at_pcie_8gbps": round(model(8.0, 8.0, overlap), 1),
        "drain_gb": round(drain_bytes / 1e9, 2),
        "stream_gb": round(stream_bytes / 1e9, 2),
    }
    print(json.dumps(result, indent=2))

    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["injected_streaming"] = result
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(f"wrote {args.out} [injected_streaming]", file=sys.stderr)


if __name__ == "__main__":
    main()
