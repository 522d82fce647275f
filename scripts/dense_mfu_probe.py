#!/usr/bin/env python
"""Which resource bounds the fused dense sweep? (VERDICT r4 #10)

Netflix-preset roofline at K=100 (kp=128 on the lanes):
  MXU:  3 matmuls x 2*N*M*kp = 6.6 TFLOP -> 33.5 ms at v5e bf16 peak
  HBM:  uint8 Y read 8.6 GB + B re-reads ~4.3 GB bf16 -> ~16 ms
  VPU:  the w stage (u8 widen, reciprocal, scale, bf16 cast) over N*M

Measured: 64 ms. This probe isolates the stages by timing kernel
VARIANTS on a Netflix-shaped block (same grid, same tiles):

  prod       the production kernel (dense_pallas._kernel)
  norecip    w := y (skip the reciprocal+scale VPU chain) — the delta
             is the VPU w-stage cost
  noyload    score-only: skip reading Y entirely (w := 1) — the delta
             vs norecip is the uint8 Y HBM+widen cost
  mmonly     only the s matmul + acc writes (no contrib matmuls) —
             1/3 of the MXU work; extrapolates pure-MXU time

Each variant is a local copy of the 20-line kernel body with one stage
removed (probing production code with dead flags would pollute it).

Usage: python scripts/dense_mfu_probe.py [n_users] [variants...]
"""

import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

M, K = 17770, 100
M_PAD = 17920
TU = TC = 512
KP = 128


def _kernel_variant(a_ref, b_ref, y_ref, acc_a_ref, acc_b_ref, *,
                    variant: str):
    u = pl.program_id(0)
    c = pl.program_id(1)
    tc = b_ref.shape[0]
    a = a_ref[:]
    b = b_ref[:]
    s = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    if variant == "mmonly":
        contrib_a = s[:, :KP] * 0.0
        contrib_b = jnp.zeros((tc, KP), jnp.float32)
    else:
        if variant == "noyload":
            w = jnp.ones_like(s).astype(jnp.bfloat16)
        else:
            y = y_ref[:].astype(jnp.int32).astype(jnp.float32)
            if variant == "norecip":
                w = y.astype(jnp.bfloat16)
            elif variant == "bf16recip":
                sc = jnp.maximum(s, 1e-30).astype(jnp.bfloat16)
                w = (y.astype(jnp.bfloat16)
                     * pl.reciprocal(sc, approx=True))
            else:  # prod
                sc = jnp.maximum(s, 1e-30)
                w = (y * pl.reciprocal(sc, approx=True)
                     ).astype(jnp.bfloat16)
        contrib_a = jnp.dot(w, b, preferred_element_type=jnp.float32)
        contrib_b = jnp.dot(w.T, a, preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_a_ref[:] = contrib_a

    @pl.when(c != 0)
    def _():
        acc_a_ref[:] = acc_a_ref[:] + contrib_a

    @pl.when(u == 0)
    def _():
        acc_b_ref[pl.ds(c * tc, tc), :] = contrib_b

    @pl.when(u != 0)
    def _():
        acc_b_ref[pl.ds(c * tc, tc), :] = (
            acc_b_ref[pl.ds(c * tc, tc), :] + contrib_b)


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(a, b, y, variant):
    np_, mp = a.shape[0], b.shape[0]
    grid = (np_ // TU, mp // TC)
    in_specs = [
        pl.BlockSpec((TU, KP), lambda u, c: (u, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, KP), lambda u, c: (c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TU, TC), lambda u, c: (u, c),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((np_, KP), jnp.float32),
                 jax.ShapeDtypeStruct((mp, KP), jnp.float32)]
    out_specs = [
        pl.BlockSpec((TU, KP), lambda u, c: (u, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mp, KP), lambda u, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_kernel_variant, variant=variant),
        grid=grid, in_specs=in_specs, out_shape=out_shape,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=6 * np_ * mp * KP,
            bytes_accessed=np_ * mp + (np_ + 2 * mp) * KP * 4,
            transcendentals=0),
    )(a, b, y)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    variants = sys.argv[2:] or ["prod", "bf16recip", "norecip",
                                "noyload", "mmonly"]
    key = jax.random.PRNGKey(7)

    @jax.jit
    def gen():
        u = jax.random.uniform(key, (n, M_PAD))
        col_ok = jnp.arange(M_PAD) < M
        return jnp.where((u < 0.01) & col_ok[None, :], 3, 0
                         ).astype(jnp.uint8)

    y = gen()
    jax.block_until_ready(y)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.gamma(0.3, 1.0, (n, KP)).astype(np.float32)
                    ).astype(jnp.bfloat16) + jnp.bfloat16(0.01)
    b = jnp.asarray(rng.gamma(0.3, 1.0, (M_PAD, KP)).astype(np.float32)
                    ).astype(jnp.bfloat16) + jnp.bfloat16(0.01)
    print(f"n={n} m={M_PAD} kp={KP} tiles {TU}x{TC}", flush=True)
    flops = 6 * n * M_PAD * KP
    for v in variants:
        try:
            ra, rb = run_variant(a, b, y, v)
            _ = np.asarray(ra[0, 0]) + np.asarray(rb[0, 0])
            t0 = time.time()
            iters = 5
            for _ in range(iters):
                ra, rb = run_variant(a, b, y, v)
            _ = np.asarray(ra[0, 0]) + np.asarray(rb[0, 0])
            ms = (time.time() - t0) / iters * 1e3
            tf = flops / (ms * 1e-3) / 1e12
            print(f"{v:10s}: {ms:7.1f} ms  ({tf:5.1f} TF/s of 197 bf16)",
                  flush=True)
        except Exception as e:
            print(f"{v:10s}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
