#!/usr/bin/env python
"""Decompose the big-sparse hybrid step cost on TPU.

The r3 EchoNest artifact showed ~3 s/iter for BOTH hybrid tails at only
7.5M tail nonzeros (~400 ns/nnz) — far above the r2 segment path's
54 ns/nnz — and the itemrank eval regressed 1.8x on unchanged math, so
this probe times each primitive in isolation to separate code effects
from data-distribution effects from chip/tunnel state:

  gather / scatter-add / sorted segment_sum at tail scale,
  the old one-pass chunked tail, the MXU tail at several chunk sizes,
  an unchunked compact segment tail, and the fused dense head alone.

Usage: python scripts/tail_probe.py [tail_nnz_millions]
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
T_HEAD = 6144


def fence(x):
    # device-side slice FIRST, then a 4-byte host transfer. np.asarray
    # on the full array pulls it over the axon tunnel at ~80 MB/s — a
    # 400 MB accumulator adds ~5 s to the timing block, which is what
    # poisoned every r3 big-sparse measurement (scripts/dense_bisect.py)
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(label, fn, *args, iters=3):
    r = fn(*args)
    fence(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    dt = (time.time() - t0) / iters
    print(f"{label:36s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


# ---- experimental half-sweep variants (measured slower than the
# shipped _half_sweep on v5e; kept here probe-only so no dead code
# ships in the product module) ----
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def _half_sweep_segsum(p_t: jax.Array, o_t: jax.Array, pc: jax.Array,
                       oc: jax.Array, y: jax.Array, *, chunk: int,
                       mm_dtype, prec) -> jax.Array:
    """Windowed-accumulator half sweep via local sorted segment_sum.

    Same contract as _half_sweep, but the per-chunk reduction onto the
    sorted side uses jax.ops.segment_sum with chunk-local ids
    (pc - pc[0], all < chunk since sorted ids step by <= 1 per entry)
    into a [chunk, kp] window, then one dynamic_update_slice
    read-modify-write per chunk — no one-hot matmul, no global scatter."""
    del prec
    np_rows, kp = p_t.shape
    pt = pc.shape[0]
    ptm = -(-pt // chunk) * chunk
    if ptm != pt:
        ext = ptm - pt
        pc = jnp.concatenate([pc, jnp.broadcast_to(pc[-1], (ext,))])
        oc = jnp.concatenate([oc, jnp.broadcast_to(oc[-1], (ext,))])
        y = jnp.concatenate([y, jnp.zeros((ext,), y.dtype)])
    steps = ptm // chunk
    pc_r = pc.reshape(steps, chunk)
    oc_r = oc.reshape(steps, chunk)
    y_r = y.reshape(steps, chunk)

    def body(acc, xs):
        pcm, ocm, ym = xs                     # [C]
        pg = p_t[pcm].astype(jnp.float32)     # [C, kp] gather
        og = o_t[ocm].astype(jnp.float32)
        prod = pg * og
        s = jnp.sum(prod, axis=1)
        w = ym / jnp.maximum(s, 1e-30)
        ph = w[:, None] * prod                # y * phi, [C, kp]
        u0 = pcm[0]
        win = jax.ops.segment_sum(ph, pcm - u0, num_segments=chunk,
                                  indices_are_sorted=True)
        cur = lax.dynamic_slice(acc, (u0, 0), (chunk, kp))
        return lax.dynamic_update_slice(acc, cur + win, (u0, 0)), None

    init = jnp.zeros((np_rows + chunk, kp), jnp.float32)
    acc, _ = lax.scan(body, init, (pc_r, oc_r, y_r))
    return acc


def _half_sweep_window(p_t: jax.Array, o_t: jax.Array, pc: jax.Array,
                       oc: jax.Array, y: jax.Array, *, chunk: int,
                       mm_dtype, prec) -> jax.Array:
    """Half sweep with the primary side fetched as a contiguous window.

    The primary (sorted) side's compact ids span < C rows per C-nonzero
    chunk, so instead of a per-row HBM gather (latency-bound, ~6 ns per
    256 B row regardless of sortedness — scripts/gather_probe.py) the
    chunk loads ONE contiguous [C, kp] window with dynamic_slice
    (bandwidth-bound) and expands rows per nonzero with the SAME one-hot
    matrix used for the reduction:

        pg      = G   @ W        (expand:  G[j, r] = [ids[j]-u0 == r])
        contrib = G^T @ (y*phi)  (reduce)

    Only the secondary side still pays the random-gather latency. Same
    contract as _half_sweep with batch == 1."""
    np_rows, kp = p_t.shape
    pt = pc.shape[0]
    ptm = -(-pt // chunk) * chunk
    if ptm != pt:
        ext = ptm - pt
        pc = jnp.concatenate([pc, jnp.broadcast_to(pc[-1], (ext,))])
        oc = jnp.concatenate([oc, jnp.broadcast_to(oc[-1], (ext,))])
        y = jnp.concatenate([y, jnp.zeros((ext,), y.dtype)])
    steps = ptm // chunk
    pc_r = pc.reshape(steps, chunk)
    oc_r = oc.reshape(steps, chunk)
    y_r = y.reshape(steps, chunk)
    # window pad: the last chunk's window may run past the table
    p_pad = jnp.pad(p_t, ((0, chunk), (0, 0)))

    iota_c = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(acc, xs):
        pcm, ocm, ym = xs                     # [C]
        u0 = pcm[0]
        w_win = lax.dynamic_slice(p_pad, (u0, 0), (chunk, kp))
        g = (pcm[:, None] - u0 == iota_c).astype(mm_dtype)   # [C, C]
        pg = jnp.dot(g, w_win.astype(mm_dtype),
                     preferred_element_type=jnp.float32,
                     precision=prec)          # [C, kp] expand
        og = o_t[ocm].astype(jnp.float32)     # [C, kp] random gather
        prod = pg * og
        s = jnp.sum(prod, axis=1)
        w = ym / jnp.maximum(s, 1e-30)
        ph = w[:, None] * prod
        contrib = jnp.dot(g.T, ph.astype(mm_dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)     # [C, kp] reduce
        cur = lax.dynamic_slice(acc, (u0, 0), (chunk, kp))
        return lax.dynamic_update_slice(acc, cur + contrib, (u0, 0)), None

    init = jnp.zeros((np_rows + chunk, kp), jnp.float32)
    acc, _ = lax.scan(body, init, (pc_r, oc_r, y_r))
    return acc




def main():
    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 7.5
    p = int(nnz_m * 1e6)
    rng = np.random.default_rng(7)
    # tail-shaped stream: user-sorted, zipf-ish items beyond the head
    u = np.sort(rng.integers(0, N, p)).astype(np.int32)
    i = np.minimum(T_HEAD + rng.zipf(1.4, p) - 1, M - 1).astype(np.int32)
    y = rng.integers(1, 5, p).astype(np.float32)

    a_lin = jnp.asarray(rng.random((N, K), np.float32) + 0.1)
    b_lin = jnp.asarray(rng.random((M, K), np.float32) + 0.1)
    ud, idv, yd = jnp.asarray(u), jnp.asarray(i), jnp.asarray(y)

    # --- primitive rates --------------------------------------------------
    timed("gather a[u] rows (sum)",
          jax.jit(lambda t, ix: jnp.sum(t[ix], dtype=jnp.float32)),
          a_lin, ud)
    timed("gather b[i] rows (sum)",
          jax.jit(lambda t, ix: jnp.sum(t[ix], dtype=jnp.float32)),
          b_lin, idv)

    ph = jnp.ones((p, K), jnp.float32)

    @jax.jit
    def scat(ph_, ix):
        return jnp.zeros((M, K), jnp.float32).at[ix].add(ph_)

    timed("scatter-add ph -> [M,K]", scat, ph, idv)

    @jax.jit
    def segsum(ph_, ix):
        return jax.ops.segment_sum(ph_, ix, num_segments=N,
                                   indices_are_sorted=True)

    timed("sorted segment_sum ph -> [N,K]", segsum, ph, ud)
    del ph

    # --- tail paths ---------------------------------------------------------
    from hgaprec_tpu.ops.sweep import _segment_onepass_lin
    from hgaprec_tpu.ops.mxu_tail import build_tail_compact, mxu_tail_sweep

    for chunk_m in (1 << 20, 4 << 20):
        f = jax.jit(lambda a, b, u_, i_, y_, c=chunk_m:
                    _segment_onepass_lin(a, b, None, None, u_, i_, y_, c)
                    .acc_a)
        timed(f"one-pass segment chunk={chunk_m >> 20}M", f,
              a_lin, b_lin, ud, idv, yd)

    tc = build_tail_compact(u, i, y)
    print(f"compact: NA={tc.users.shape[0]} MT={tc.items.shape[0]}",
          flush=True)
    for chunk in (1024, 4096):
        # sum BOTH accumulators — returning acc_a alone DCEs the whole
        # item-side half and under-reports the tail cost 2x
        f = jax.jit(lambda a, b, t=tc, c=chunk: sum(
            jnp.sum(r) for r in
            mxu_tail_sweep(a, b, None, None, t, chunk=c, bf16=True)[:2]))
        timed(f"mxu tail chunk={chunk} bf16 (both)", f, a_lin, b_lin)

    # half-sweep decomposition: which side pays, and does the one-hot
    # einsum or the windowed local segment_sum win per half?
    from hgaprec_tpu.ops.mxu_tail import _augment, _half_sweep
    import jax.numpy as jnp_
    na, mt = tc.users.shape[0], tc.items.shape[0]
    kp = 128
    a_t = _augment(a_lin[tc.users], None, None, kp).astype(jnp_.bfloat16)
    b_t = _augment(b_lin[tc.items], None, None, kp).astype(jnp_.bfloat16)
    for label, fn, args in (
        ("half onehot user-side", _half_sweep,
         (a_t, b_t, tc.cu, tc.ci, tc.y)),
        ("half onehot item-side", _half_sweep,
         (b_t, a_t, tc.ci_i, tc.cu_i, tc.y_i)),
    ):
        f = jax.jit(lambda p, o, pc, oc, yy, fn=fn: fn(
            p, o, pc, oc, yy, chunk=512, batch=64,
            mm_dtype=jnp_.bfloat16, prec=None))
        timed(label, f, *args)
    for chunk in (4096, 32768):
        f = jax.jit(lambda p, o, pc, oc, yy, c=chunk: _half_sweep_segsum(
            p, o, pc, oc, yy, chunk=c, mm_dtype=jnp_.bfloat16, prec=None))
        timed(f"half segsum user-side c={chunk}", f,
              a_t, b_t, tc.cu, tc.ci, tc.y)
        timed(f"half segsum item-side c={chunk}", f,
              b_t, a_t, tc.ci_i, tc.cu_i, tc.y_i)

    # unchunked compact segment: materialize ph once at tail scale
    na, mt = tc.users.shape[0], tc.items.shape[0]

    @jax.jit
    def unchunked(a, b):
        at = a[tc.users]
        bt = b[tc.items]
        av = at[tc.cu]
        bv = bt[tc.ci]
        prod = av * bv
        s = jnp.sum(prod, axis=1)
        w = jnp.where(tc.y > 0, tc.y / jnp.maximum(s, 1e-30), 0.0)
        ph_ = w[:, None] * prod
        acc_a = jax.ops.segment_sum(ph_, tc.cu, num_segments=na,
                                    indices_are_sorted=True)
        acc_b = jnp.zeros((mt, K), jnp.float32).at[tc.ci].add(ph_)
        return acc_a, acc_b

    timed("unchunked compact segment", unchunked, a_lin, b_lin)

    # --- fused dense head alone ---------------------------------------------
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep
    npad = -(-N // 512) * 512
    hd = jnp.zeros((npad, T_HEAD), jnp.uint8)  # zeros: W=0, same traffic
    bh = b_lin[:T_HEAD]
    f = jax.jit(lambda a, b, yh: fused_dense_sweep(a, b, yh, bf16=True)[0])
    timed(f"fused dense head [{npad}x{T_HEAD}]", f, a_lin, bh, hd)


if __name__ == "__main__":
    main()
