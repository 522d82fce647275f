#!/usr/bin/env python
"""Probe: XLA row-gather throughput on TPU vs row width and dtype.

The big-sparse segment sweep is gather-bound (EchoNest: bf16 == f32
ms/iter exactly). This measures whether lane-aligning the factor rows
(K=100 -> 128) or narrowing them (bf16) changes gather throughput, to
decide how sweep_segment_chunked should lay out its operands.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

N = 1_000_000
P = 8_000_000   # gathered rows (sorted, like a COO chunk stream)


def main():
    rng = np.random.default_rng(0)
    idx = np.sort(rng.integers(0, N, P)).astype(np.int32)
    idx_d = jnp.asarray(idx)
    for k, dt in ((100, jnp.float32), (128, jnp.float32),
                  (104, jnp.float32), (128, jnp.bfloat16),
                  (100, jnp.bfloat16)):
        tab = jnp.asarray(rng.random((N, k)), dtype=dt)

        @jax.jit
        def f(t, ix):
            return jnp.sum(t[ix], dtype=jnp.float32)

        r = f(tab, idx_d)
        _ = np.asarray(r)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            r = f(tab, idx_d)
        _ = np.asarray(r)
        dtime = (time.time() - t0) / iters
        bytes_ = P * k * tab.dtype.itemsize
        print(f"k={k:4d} {tab.dtype.name:9s}: {dtime*1e3:7.1f} ms  "
              f"{bytes_/dtime/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
