"""MXU-native sparse CAVI sweep for the big-sparse tail.

The chunked segment sweep (ops/sweep.py::_segment_onepass_lin) is
gather-LATENCY-bound on TPU: ~6 ns per gathered factor row regardless of
row width (scripts/gather_probe.py), and it spends ~4 row-ops per
nonzero (two gathers, one segment-sum, one scatter) -> ~54 ns/nnz
measured at EchoNest/NYT scale. This module re-expresses the sweep so
that three of those four row-ops become MXU matmuls and contiguous DMA
slabs, leaving ONE true gather per nonzero:

  * ids are COMPACTED host-side (build_tail_compact): users that appear
    in the stream get dense ids 0..NA-1, items 0..MT-1. Because compact
    ids of a user-sorted stream increase by at most 1 per distinct user,
    any chunk of C nonzeros spans < C compact user rows — so the user
    rows a chunk needs are a CONTIGUOUS slab A[u0:u0+C], fetched with
    one dynamic-slice DMA (bandwidth-bound, not latency-bound).
  * the per-nonzero row selection within the slab is a one-hot matmul:
    G[j, r] = [cu[j] - u0 == r], ag = G @ slab — MXU work, ~2*C*Kp
    flops/nnz (~3 ns at C=1024, Kp=128).
  * the user-side shape accumulation is the transpose matmul
    G^T @ (y*phi) added into the accumulator slab in place.
  * the item side keeps one scatter-add (items of a user-sorted chunk
    are not contiguous) and the opposite-factor rows keep one gather —
    the irreducible latency cost.

Bias terms ride the same matmuls via two augmented columns:
  a_hat = [A | ba | 1],  b_hat = [B | 1 | bb]
so  <a_hat, b_hat> = A.B + ba + bb  (the reference's K+2 phi slots,
hgaprec.cc:223-239), and y*phi's columns K / K+1 are exactly the bias
shape statistics — no separate bias reductions.

Matches the reference per-nonzero loop (hgaprec.cc:928-941) up to f32
summation order; equals _segment_onepass_lin on the same data (see
tests/test_mxu_tail.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LANE = 128
DEF_CHUNK = 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TailCompact:
    """Compact-id COO stream for the MXU tail sweep (host-built).

    cu/ci are compact ids into `users`/`items`; padding entries repeat
    the last real compact id (keeping the span-<C invariant) and carry
    y = 0 so they contribute nothing.
    """
    cu: jax.Array        # i32[PT] compact user id per nonzero, sorted
    ci: jax.Array        # i32[PT] compact item id per nonzero
    y: jax.Array         # f32[PT] counts (0 on padding)
    users: jax.Array     # i32[NA] active user ids (sorted)
    items: jax.Array     # i32[MT] active item ids (sorted)


def build_tail_compact(u: np.ndarray, i: np.ndarray, y: np.ndarray,
                       *, pad_multiple: int = DEF_CHUNK
                       ) -> Optional[TailCompact]:
    """Compact a user-sorted COO stream. Returns None when empty."""
    if u.size == 0:
        return None
    users, cu = np.unique(u, return_inverse=True)
    items, ci = np.unique(i, return_inverse=True)
    pt = -(-u.size // pad_multiple) * pad_multiple
    pad = pt - u.size
    j = jnp.asarray
    return TailCompact(
        cu=j(np.concatenate([cu, np.full(pad, cu[-1])]).astype(np.int32)),
        ci=j(np.concatenate([ci, np.full(pad, ci[-1])]).astype(np.int32)),
        y=j(np.concatenate([y.astype(np.float32), np.zeros(pad, np.float32)])),
        users=j(users.astype(np.int32)),
        items=j(items.astype(np.int32)),
    )


def _augment(x: jax.Array, col_a: Optional[jax.Array],
             col_b: Optional[jax.Array], kp: int) -> jax.Array:
    """[R, K] -> [R, kp] with optional bias columns K and K+1."""
    cols = [x]
    if col_a is not None:
        cols.append(col_a[:, None])
        cols.append(col_b[:, None])
    x = jnp.concatenate(cols, axis=1) if len(cols) > 1 else x
    if x.shape[1] < kp:
        x = jnp.pad(x, ((0, 0), (0, kp - x.shape[1])))
    return x


def mxu_tail_sweep(a_lin: jax.Array, b_lin: jax.Array,
                   ba_lin: Optional[jax.Array],
                   bb_lin: Optional[jax.Array],
                   tc: TailCompact, *, chunk: int = DEF_CHUNK,
                   bf16: bool = False
                   ) -> Tuple[jax.Array, jax.Array,
                              Optional[jax.Array], Optional[jax.Array]]:
    """One sweep over the compact stream.

    a_lin/b_lin: f32[N, K]/[M, K] linear-space expectations (exp Elog);
    ba_lin/bb_lin: optional f32[N]/[M] bias expectations. Returns
    (acc_a [N,K], acc_b [M,K], acc_ba [N] | None, acc_bb [M] | None) —
    the y*phi sufficient statistics, same convention as
    ops.sweep._segment_onepass_lin.
    """
    n, k = a_lin.shape
    m = b_lin.shape[0]
    bias = ba_lin is not None
    kaug = k + 2 if bias else k
    kp = -(-kaug // LANE) * LANE
    na = tc.users.shape[0]
    mt = tc.items.shape[0]
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    prec = None if bf16 else lax.Precision.HIGHEST

    # compact factor tables, bias-augmented, lane-padded
    ones_a = jnp.ones((na,), a_lin.dtype) if bias else None
    ones_b = jnp.ones((mt,), b_lin.dtype) if bias else None
    a_t = _augment(a_lin[tc.users],
                   ba_lin[tc.users] if bias else None, ones_a, kp)
    b_t = _augment(b_lin[tc.items], ones_b,
                   bb_lin[tc.items] if bias else None, kp)
    a_t = jnp.pad(a_t, ((0, chunk), (0, 0))).astype(mm_dtype)  # slab bounds
    b_t = b_t.astype(mm_dtype)

    # re-pad the stream to a chunk multiple (repeating the last compact
    # ids preserves both sortedness and the span-<chunk invariant)
    pt = tc.cu.shape[0]
    ptc = -(-pt // chunk) * chunk
    if ptc != pt:
        ext = ptc - pt
        cu = jnp.concatenate([tc.cu, jnp.broadcast_to(tc.cu[-1], (ext,))])
        ci = jnp.concatenate([tc.ci, jnp.broadcast_to(tc.ci[-1], (ext,))])
        yy = jnp.concatenate([tc.y, jnp.zeros((ext,), tc.y.dtype)])
    else:
        cu, ci, yy = tc.cu, tc.ci, tc.y
    nc = ptc // chunk
    cu_r = cu.reshape(nc, chunk)
    ci_r = ci.reshape(nc, chunk)
    y_r = yy.reshape(nc, chunk)

    iota_c = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(carry, xs):
        acc_a, acc_b = carry
        cu_c, ci_c, y_c = xs
        u0 = cu_c[0]
        slab = lax.dynamic_slice(a_t, (u0, 0), (chunk, kp))   # DMA, contig
        g = (cu_c[:, None] - u0 == iota_c).astype(mm_dtype)   # [C, C] 0/1
        ag = jnp.dot(g, slab, preferred_element_type=jnp.float32,
                     precision=prec)                          # "gather"
        bg = b_t[ci_c].astype(jnp.float32)                    # true gather
        prod = ag * bg                                        # [C, kp] f32
        s = jnp.sum(prod, axis=1)          # = A.B + ba + bb (aug cols)
        w = jnp.where(y_c > 0, y_c / jnp.maximum(s, 1e-30), 0.0)
        ph = w[:, None] * prod                                # y * phi
        contrib = jnp.dot(g.T, ph.astype(mm_dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)                     # segment sum
        cur = lax.dynamic_slice(acc_a, (u0, 0), (chunk, kp))
        acc_a = lax.dynamic_update_slice(acc_a, cur + contrib, (u0, 0))
        acc_b = acc_b.at[ci_c].add(ph)
        return (acc_a, acc_b), None

    init = (jnp.zeros((na + chunk, kp), jnp.float32),
            jnp.zeros((mt, kp), jnp.float32))
    (acc_a_c, acc_b_c), _ = lax.scan(body, init, (cu_r, ci_r, y_r))

    # scatter compact accumulators back to full index space
    acc_a = jnp.zeros((n, k), jnp.float32).at[tc.users].set(
        acc_a_c[:na, :k])
    acc_b = jnp.zeros((m, k), jnp.float32).at[tc.items].set(
        acc_b_c[:, :k])
    if bias:
        acc_ba = jnp.zeros((n,), jnp.float32).at[tc.users].set(
            acc_a_c[:na, k])
        acc_bb = jnp.zeros((m,), jnp.float32).at[tc.items].set(
            acc_b_c[:, k + 1])
        return acc_a, acc_b, acc_ba, acc_bb
    return acc_a, acc_b, None, None
