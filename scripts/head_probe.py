#!/usr/bin/env python
"""Isolate the fused dense kernel's cost at hybrid-head shapes.

The r4 tail_probe measured the fused dense head at [1019392 x 6144]
~100x slower per FLOP than the same kernel at Netflix [480256 x 17920],
in a process that had already allocated/freed several GB of probe
buffers. This microbench runs ONLY the dense kernel, at several (rows,
cols) shapes, in a fresh process, to separate shape effects from
device-state effects.

Usage: python scripts/head_probe.py [rows cols]...
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

K = 100


def fence(x):
    # device-side slice FIRST, then a 4-byte host transfer (a full-array
    # np.asarray rides the ~80 MB/s axon tunnel and dominates the timing)
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def bench(n, m, iters=3):
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep
    rng = np.random.default_rng(0)
    npad = -(-n // 512) * 512
    mpad = -(-m // 512) * 512
    a = jnp.asarray(rng.random((n, K), np.float32) + 0.1)
    b = jnp.asarray(rng.random((m, K), np.float32) + 0.1)

    # ~1% density like Netflix; nonzero y so w != 0; generated on device
    @jax.jit
    def gen(key):
        r = jax.random.uniform(key, (npad, mpad))
        return (r < 0.01).astype(jnp.uint8)

    y = gen(jax.random.PRNGKey(1))
    fence(y)
    f = jax.jit(lambda a_, b_, y_: fused_dense_sweep(a_, b_, y_,
                                                     bf16=True)[0])
    r = f(a, b, y)
    fence(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(a, b, y)
    fence(r)
    dt = (time.time() - t0) / iters
    flops = 6 * npad * mpad * 128
    print(f"[{npad}x{mpad}] {dt * 1e3:9.1f} ms  "
          f"{flops / dt / 1e12:6.1f} TF/s", flush=True)
    del a, b, y, r


def main():
    shapes = []
    args = sys.argv[1:]
    while len(args) >= 2:
        shapes.append((int(args[0]), int(args[1])))
        args = args[2:]
    if not shapes:
        shapes = [(480189, 17770),    # netflix (the known-good point)
                  (480189, 6144),     # netflix rows, head cols
                  (1019318, 6144),    # echonest head
                  (1019318, 17770)]   # echonest rows, netflix cols
    for n, m in shapes:
        bench(n, m)


if __name__ == "__main__":
    main()
