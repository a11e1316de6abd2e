"""Probe: can a host→device transfer overlap device compute through this
transport? Times (a) compute alone, (b) copy alone, (c) same-thread
copy-after-dispatch, (d) copy in a prefetch THREAD racing the compute —
the dispatch pattern the injected-streaming prefetcher uses.

    python scripts/tests/overlap_probe.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import numpy as np

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def main():
    import functools

    dev = jax.devices()[0]
    n = 4096

    a = jax.device_put(np.ones((n, n), np.float32), dev)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, reps):
        def body(x, _):
            return x @ a * (1.0 / n), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    host = np.ones((256, 1024, 1024), np.float16)  # 512 MB
    jax.device_put(host[:1], dev).block_until_ready()  # warm path

    # calibrate compute to ~ the copy time
    chain(a, 8).block_until_ready()
    t0 = time.perf_counter(); chain(a, 8).block_until_ready()
    per8 = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(host, dev))
    copy_s = time.perf_counter() - t0
    print(f"copy alone: {copy_s*1e3:.0f} ms "
          f"({host.nbytes/copy_s/1e9:.2f} GB/s)", flush=True)

    reps = max(8, int(8 * copy_s / max(per8, 1e-3)))
    chain(a, reps).block_until_ready()
    t0 = time.perf_counter(); chain(a, reps).block_until_ready()
    compute_s = time.perf_counter() - t0
    print(f"compute alone: {compute_s*1e3:.0f} ms (reps={reps})", flush=True)

    # (c) same thread: dispatch compute, then device_put
    t0 = time.perf_counter()
    out = chain(a, reps)
    put = jax.device_put(host, dev)
    jax.block_until_ready((out, put))
    both_same = time.perf_counter() - t0

    # (d) prefetch thread
    pool = ThreadPoolExecutor(1)
    t0 = time.perf_counter()
    fut = pool.submit(lambda: jax.block_until_ready(jax.device_put(host, dev)))
    out = chain(a, reps)
    out.block_until_ready()
    fut.result()
    both_thread = time.perf_counter() - t0

    for name, both in (("same-thread", both_same), ("thread", both_thread)):
        ov = max(0.0, (compute_s + copy_s - both) / min(compute_s, copy_s))
        print(f"{name}: together {both*1e3:.0f} ms, overlap {ov:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
