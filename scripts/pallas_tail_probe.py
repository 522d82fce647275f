#!/usr/bin/env python
"""Pallas tail kernel vs the XLA MXU tail on hardware, EchoNest shape.

Times, at a tail-shaped stream (user-sorted, zipf items past the head):

  1. mxu_tail_sweep both halves (the shipped XLA two-pass baseline)
  2. pallas_tail_sweep both halves (windowed DMA + VMEM ring kernel)
  3. the two pallas halves separately
  4. the og pre-gather alone (the kernel's one XLA gather per half)

and cross-checks pallas vs mxu numerics on device.

Usage: python scripts/pallas_tail_probe.py [tail_nnz_millions]
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

N, M, K = 1019318, 384546, 100
T_HEAD = 4096


def fence(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(label, fn, *args, iters=3, nnz=None):
    r = fn(*args)
    fence(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    dt = (time.time() - t0) / iters
    per = f"  {dt * 1e9 / nnz:6.1f} ns/nnz" if nnz else ""
    print(f"{label:40s} {dt * 1e3:9.1f} ms{per}", flush=True)
    return r


def main():
    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.6
    p = int(nnz_m * 1e6)
    rng = np.random.default_rng(7)
    u = np.sort(rng.integers(0, N, p)).astype(np.int32)
    i = np.minimum(T_HEAD + rng.zipf(1.4, p) - 1, M - 1).astype(np.int32)
    y = rng.integers(1, 5, p).astype(np.float32)

    a_lin = jnp.asarray(rng.random((N, K), np.float32) + 0.1)
    b_lin = jnp.asarray(rng.random((M, K), np.float32) + 0.1)

    from hgaprec_tpu.ops.mxu_tail import (_augment, build_tail_compact,
                                          mxu_tail_sweep)
    from hgaprec_tpu.ops.pallas_tail import (pallas_half_sweep,
                                             pallas_tail_sweep)

    tc = build_tail_compact(u, i, y, n_users=N)
    na, mt = tc.users.shape[0], tc.items.shape[0]
    print(f"nnz={p / 1e6:.1f}M NA={na} MT={mt} "
          f"chunks={tc.cu.shape[0] // 1024} "
          f"identity_u={tc.w0_ur is not None}", flush=True)

    def both(f):
        def g(a, b):
            ra, rb, _, _ = f(a, b, None, None, tc, bf16=True)
            return jnp.sum(ra) + jnp.sum(rb)
        return jax.jit(g)

    r_mxu = timed("mxu tail both halves bf16", both(mxu_tail_sweep),
                  a_lin, b_lin, nnz=p)
    r_pal = timed("pallas tail both halves bf16",
                  both(pallas_tail_sweep), a_lin, b_lin, nnz=p)

    # numerics cross-check (scalar reduce of f32 accumulators)
    fm = jax.jit(lambda a, b: mxu_tail_sweep(a, b, None, None, tc,
                                             bf16=True)[0])
    fp = jax.jit(lambda a, b: pallas_tail_sweep(a, b, None, None, tc,
                                                bf16=True)[0])
    am = fm(a_lin, b_lin)
    ap = fp(a_lin, b_lin)
    err = float(jnp.max(jnp.abs(am - ap) / (jnp.abs(am) + 1e-3)))
    print(f"max rel diff pallas vs mxu (acc_a): {err:.2e}", flush=True)

    # halves separately (bf16 tables prepared once, like the wrapper)
    kp = 128
    a_t = _augment(a_lin[tc.users], None, None, kp).astype(jnp.bfloat16)
    b_t = _augment(b_lin[tc.items], None, None, kp).astype(jnp.bfloat16)

    fu = jax.jit(lambda pt_, o, l, w0, yy: jnp.sum(pallas_half_sweep(
        pt_, o, l, w0, yy, np_rows=na, bf16=True)))
    fi = jax.jit(lambda pt_, o, l, w0, yy: jnp.sum(pallas_half_sweep(
        pt_, o, l, w0, yy, np_rows=mt, bf16=True)))
    og_u = jax.jit(lambda b_, ix: b_[ix])(b_t, tc.ci)
    og_i = jax.jit(lambda a_, ix: a_[ix])(a_t, tc.cu_i)
    timed("pallas half user (og precomputed)", fu, a_t, og_u, tc.l_u,
          tc.w0_u, tc.y, nnz=p)
    timed("pallas half item (og precomputed)", fi, b_t, og_i, tc.l_i,
          tc.w0_i, tc.y_i, nnz=p)

    timed("og pre-gather alone (item rows)",
          jax.jit(lambda b_, ix: jnp.sum(b_[ix], dtype=jnp.float32)),
          b_t, tc.ci, nnz=p)

    # --- geometry variant: ALIGN=256 (smaller window, 17% less MXU) ---
    from hgaprec_tpu.ops.pallas_tail import chunk_windows
    cu_np = np.asarray(tc.cu)
    w0u2, lu2 = chunk_windows(cu_np, align=256)
    fu2 = jax.jit(lambda pt_, o, l, w0_, yy: jnp.sum(pallas_half_sweep(
        pt_, o, l, w0_, yy, np_rows=na, bf16=True, align=256)))
    timed("pallas half user align=256", fu2, a_t, og_u,
          jnp.asarray(lu2), jnp.asarray(w0u2), tc.y, nnz=p)

    # --- identity primary: NA ~= N, skip the compact-table gather ----
    # raw user ids are nearly compact; if their chunk spans fit the
    # window the kernel can run on the FULL table directly (no
    # a_lin[users] gather, no .at[users].set expansion)
    pt_len = cu_np.shape[0]
    u_pad = np.concatenate([u, np.full(pt_len - p, u[-1], np.int32)])
    try:
        w0r, lr = chunk_windows(u_pad)
        a_full = _augment(a_lin, None, None, kp).astype(jnp.bfloat16)
        fu3 = jax.jit(lambda pt_, o, l, w0_, yy: jnp.sum(
            pallas_half_sweep(pt_, o, l, w0_, yy, np_rows=N, bf16=True)))
        timed("pallas half user identity-table", fu3, a_full, og_u,
              jnp.asarray(lr), jnp.asarray(w0r), tc.y, nnz=p)
    except AssertionError:
        print("identity-table: span invariant violated, skipped",
              flush=True)


if __name__ == "__main__":
    main()
