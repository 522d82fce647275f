#!/usr/bin/env python
"""Tile-size probe for the fused dense-sweep Pallas kernel on real TPU.

Netflix-preset item catalog (17770 -> padded 17920) with a reduced user
count so on-device data gen stays cheap; per-iteration time scales
linearly in user tiles, so relative tile-shape wins transfer to full N.

Usage: python scripts/pallas_tile_probe.py [n_users]
"""
import itertools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

M, K = 17770, 100
M_PAD = 17920   # 512-multiple; fits the VMEM acc budget


def gen_dense(n, seed=7, density=0.01):
    """Device-side Bernoulli fill at Netflix density — the kernel's
    runtime depends on shapes, not the count values. (Host-side fill
    costs minutes here: the sandbox host page-faults ~1.5 ms per
    first-touch page.)"""
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def gen():
        u = jax.random.uniform(key, (n, M_PAD))
        col_ok = jnp.arange(M_PAD) < M
        return jnp.where((u < density) & col_ok[None, :], 3, 0
                         ).astype(jnp.uint8)

    return gen()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep

    t0 = time.time()
    y = gen_dense(n)
    jax.block_until_ready(y)
    nnz = int(jnp.sum(y > 0))
    print(f"gen {time.time()-t0:.0f}s  n={n} nnz={nnz/1e6:.1f}M", flush=True)

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.gamma(0.3, 1.0, (n, K)).astype(np.float32)) + 0.01
    b = jnp.asarray(rng.gamma(0.3, 1.0, (M_PAD, K)).astype(np.float32)) + 0.01

    for bf16, tu, tc in itertools.product(
            (True, False), (256, 512, 1024), (512, 1024, 2048)):
        # acc_b VMEM = M_PAD/tc-rounded * 128 * 4; w tile = tu*tc*4
        if tu * tc * 4 > (8 << 20):
            continue
        try:
            t0 = time.time()
            ra, rb = fused_dense_sweep(a, b, y, bf16=bf16, tile_u=tu,
                                       tile_c=tc)
            _ = np.asarray(ra[0, 0]) + np.asarray(rb[0, 0])
            compile_s = time.time() - t0
            iters = 5
            t0 = time.time()
            for _ in range(iters):
                ra, rb = fused_dense_sweep(a, b, y, bf16=bf16, tile_u=tu,
                                           tile_c=tc)
            _ = np.asarray(ra[0, 0]) + np.asarray(rb[0, 0])
            ms = (time.time() - t0) / iters * 1e3
            print(f"bf16={int(bf16)} tile_u={tu:5d} tile_c={tc:5d}: "
                  f"{ms:7.1f} ms  (compile {compile_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"bf16={int(bf16)} tile_u={tu:5d} tile_c={tc:5d}: "
                  f"FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
