"""DESIGN NOTE (not shipped): fused Pallas CSR kernel for the sparse
CAVI sweep.

Status: retired from the package after two rounds as hardware-dead
speculative code. It is correct under the Pallas interpreter (it was
covered by tests/test_pallas_sweep.py until it moved here), but cannot
lower on TPU v5e, where `tpu.dynamic_gather` only shuffles within one
(8, 128) tile — the vectorized VMEM row-gathers at its core have no v5e
lowering. The production sparse path is now `ops/mxu_tail.py`: a
scatter-free two-pass formulation at the XLA level (compact-id sorted
streams + batched one-hot transpose matmuls) that achieves the same
goal — no scatter, MXU reductions — with ops XLA can always lower.
This file stays as the blueprint for a future single-pass Pallas kernel
on hardware/toolchains with cross-tile gathers (its chunk-local
cumsum + boundary-gather segment reduction remains the right in-VMEM
trick there).

Original header follows.

Fused Pallas TPU kernel for the sparse CAVI sweep.

The reference hot loop (hgaprec.cc:928-941) touches each nonzero once:
phi = softmax(Elog theta[u] + Elog beta[i]), scaled by y, accumulated into
both shape buffers. The dense MXU path (ops/sweep.py) densifies Y; this
kernel instead works at O(nnz * K):

  user pass (grid over user row-tiles):
    * A tile rows and the full B matrix live in VMEM (linear space,
      lane-padded K);
    * COO chunks (i_ids, y) DMA'd HBM->VMEM;
    * per-nonzero weight w = y / (A[u]·B[i]) via vectorized row gathers;
    * segment reduction WITHOUT scatter: chunk-local running cumsum of
      w*B[i] rows + a per-row boundary gather (CSR starts/ends), the
      sorted-COO equivalent of the reference's add_slice accumulation;
    * w written back to HBM for the item pass.
  item pass: symmetric, over item col-tiles with w permuted to item order.

VMEM condition: the opposite-side factor matrix must fit on chip
(M*K*4 bytes for the user pass — e.g. Netflix 17.7k x 100 ~ 9 MB).

HARDWARE STATUS: correct under the Pallas interpreter (tested), but TPU
v5e's `tpu.dynamic_gather` only shuffles within one (8, 128) tile, so the
vectorized row-gathers (jnp.take of C rows from a VMEM table) do not
lower on this generation. On v5e the dense MXU path (ops/sweep.py) is
the production sweep — at MovieLens/Netflix densities (1-5%) every
256x256 tile of Y is nonempty, so tile-granular sparsity cannot skip
work and the dense path's arithmetic intensity wins. This kernel is kept
as the sparse path for hardware/toolchains with cross-tile gathers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEF_ROWS = 256       # rows per output tile
DEF_CHUNK = 1024     # nonzeros per DMA chunk


def _pad_cols(x: jax.Array, k_pad: int) -> jax.Array:
    k = x.shape[1]
    if k == k_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, k_pad - k)))


def _pad_rows_np(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _sweep_pass_kernel(starts_ref, ends_ref, a_tile_ref, b_full_ref,
                       ids_hbm, y_hbm, own_hbm, out_ref, w_out_hbm,
                       ids_vmem, y_vmem, own_vmem, w_vmem, sem_in, sem_w,
                       *, chunk: int, rows: int, write_w: bool,
                       use_w_in: bool):
    """One output tile: rows [t*BR, (t+1)*BR) of the accumulator.

    starts/ends: i32[BR] CSR boundaries (absolute nonzero positions).
    a_tile: f32[BR, Kp] linear-space rows of this side's factor.
    b_full: f32[rows_b, Kp] full opposite-side linear factor (VMEM).
    ids_hbm: i32[P] opposite-side ids per nonzero (this side's sort order).
    y_hbm:   f32[P] y (write_w) or precomputed w (use_w_in).
    out:     f32[BR, Kp] = a_tile * segment_sum(w * b[ids]).
    w_out:   f32[P] per-nonzero weights (user pass only).
    """
    br = out_ref.shape[0]
    base = starts_ref[0]
    tile_end = ends_ref[br - 1]
    nnz_tile = tile_end - base
    nchunks = jnp.maximum(pl.cdiv(nnz_tile, chunk), 0)

    tile_base = pl.program_id(0) * rows

    def chunk_body(c, acc):
        start = base + c * chunk
        cp_i = pltpu.make_async_copy(ids_hbm.at[pl.ds(start, chunk)],
                                     ids_vmem, sem_in.at[0])
        cp_y = pltpu.make_async_copy(y_hbm.at[pl.ds(start, chunk)],
                                     y_vmem, sem_in.at[1])
        cp_i.start()
        cp_y.start()
        if not use_w_in:
            cp_o = pltpu.make_async_copy(own_hbm.at[pl.ds(start, chunk)],
                                         own_vmem, sem_in.at[2])
            cp_o.start()
            cp_o.wait()
        cp_i.wait()
        cp_y.wait()
        ids = ids_vmem[:]
        bg = jnp.take(b_full_ref[:], ids, axis=0)          # [C, Kp]
        if use_w_in:
            w = y_vmem[:]
        else:
            # this-side local row per nonzero, direct from the sorted ids
            row = jnp.clip(own_vmem[:] - tile_base, 0, br - 1)
            ag = jnp.take(a_tile_ref[:], row, axis=0)      # [C, Kp]
            s = jnp.sum(ag * bg, axis=1)
            y = y_vmem[:]
            w = jnp.where(y > 0, y / jnp.maximum(s, 1e-30), 0.0)
            if write_w:
                w_vmem[:] = w
                cp_w = pltpu.make_async_copy(
                    w_vmem, w_out_hbm.at[pl.ds(start, chunk)], sem_w)
                cp_w.start()
                cp_w.wait()
        contrib = w[:, None] * bg                          # [C, Kp]
        cs = jnp.cumsum(contrib, axis=0)                   # [C, Kp]
        cs = jnp.concatenate(
            [jnp.zeros((1, cs.shape[1]), cs.dtype), cs], axis=0)
        lo = jnp.clip(starts_ref[:] - start, 0, chunk)     # [BR]
        hi = jnp.clip(ends_ref[:] - start, 0, chunk)
        acc = acc + (jnp.take(cs, hi, axis=0) - jnp.take(cs, lo, axis=0))
        return acc

    acc0 = jnp.zeros(out_ref.shape, out_ref.dtype)
    acc = jax.lax.fori_loop(0, nchunks, chunk_body, acc0)
    out_ref[:] = a_tile_ref[:] * acc


def _run_pass(a_lin, b_lin, starts, ends, ids, yw, own, *, rows: int,
              chunk: int, write_w: bool, use_w_in: bool):
    """a_lin: [R, Kp] this-side linear factors (R padded to rows multiple);
    returns (acc [R, Kp], w [P] or None)."""
    r, kp = a_lin.shape
    p = ids.shape[0]
    ntiles = r // rows
    grid = (ntiles,)

    out_shapes = [jax.ShapeDtypeStruct((r, kp), jnp.float32),
                  jax.ShapeDtypeStruct((p,), jnp.float32)]
    out_specs = [
        pl.BlockSpec((rows, kp), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    in_specs = [
        pl.BlockSpec((rows,), lambda t: (t,), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows,), lambda t: (t,), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, kp), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # b_full
        pl.BlockSpec(memory_space=pl.ANY),    # ids (HBM)
        pl.BlockSpec(memory_space=pl.ANY),    # y or w (HBM)
        pl.BlockSpec(memory_space=pl.ANY),    # own ids (HBM)
    ]
    kernel = functools.partial(_sweep_pass_kernel, chunk=chunk, rows=rows,
                               write_w=write_w, use_w_in=use_w_in)
    acc, w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.float32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, ends, a_lin, b_lin, ids, yw, own)
    return acc, w


def sweep_pallas(elog_a: jax.Array, elog_b: jax.Array, csr,
                 *, rows: int = DEF_ROWS, chunk: int = DEF_CHUNK
                 ) -> Tuple[jax.Array, jax.Array]:
    """Fused sparse sweep. csr: PallasCsr (see build_pallas_csr).

    Returns (acc_a [N, K], acc_b [M, K]) — the y*phi sums, identical to
    ops.sweep.sweep_segment (no-bias path).
    """
    n, k = elog_a.shape
    m = elog_b.shape[0]
    kp = -(-k // LANE) * LANE
    a_lin = _pad_cols(jnp.exp(elog_a), kp)
    b_lin = _pad_cols(jnp.exp(elog_b), kp)
    rpad_a = -(-n // rows) * rows
    rpad_b = -(-m // rows) * rows
    a_lin_p = _pad_rows_np(a_lin, rpad_a)
    b_lin_p = _pad_rows_np(b_lin, rpad_b)

    acc_a, w = _run_pass(a_lin_p, b_lin, csr.row_starts, csr.row_ends,
                         csr.i_ids, csr.y, csr.u_ids, rows=rows,
                         chunk=chunk, write_w=True, use_w_in=False)
    w_item = jnp.take(w, csr.item_order, axis=0)
    acc_b, _ = _run_pass(b_lin_p, a_lin, csr.col_starts, csr.col_ends,
                         csr.u_ids_by_item, w_item, csr.u_ids_by_item,
                         rows=rows, chunk=chunk, write_w=False,
                         use_w_in=True)
    return acc_a[:n, :k], acc_b[:m, :k]


class PallasCsr:
    """Static-shape CSR/CSC boundary arrays for the Pallas sweep."""

    def __init__(self, row_starts, row_ends, col_starts, col_ends, i_ids,
                 u_ids, y, u_ids_by_item, item_order):
        self.row_starts = row_starts   # i32[N_pad]
        self.row_ends = row_ends
        self.col_starts = col_starts   # i32[M_pad]
        self.col_ends = col_ends
        self.i_ids = i_ids             # i32[P] user-sorted
        self.u_ids = u_ids             # i32[P] user-sorted
        self.y = y                     # f32[P]
        self.u_ids_by_item = u_ids_by_item  # i32[P] item-sorted
        self.item_order = item_order   # i32[P]


def build_pallas_csr(store, *, rows: int = DEF_ROWS,
                     chunk: int = DEF_CHUNK) -> PallasCsr:
    """Host-side construction from a finalized RatingsStore."""
    n, m = store.n, store.m
    u = store.coo_u.astype(np.int64)
    i = store.coo_i.astype(np.int64)
    y = store.coo_y.astype(np.float32)
    nnz = u.size
    # pad the nonzero arrays so chunk DMAs past the end stay in bounds
    p = nnz + chunk
    i_ids = np.concatenate([i, np.zeros(chunk, np.int64)]).astype(np.int32)
    u_ids = np.concatenate([u, np.zeros(chunk, np.int64)]).astype(np.int32)
    y_pad = np.concatenate([y, np.zeros(chunk, np.float32)])
    item_order = np.argsort(i, kind="stable").astype(np.int64)
    u_by_item = u[item_order].astype(np.int32)
    u_by_item = np.concatenate([u_by_item,
                                np.zeros(chunk, np.int32)])
    item_order_p = np.concatenate(
        [item_order, np.full(chunk, nnz, np.int64)]).astype(np.int32)

    counts_u = np.bincount(u, minlength=n)
    rp = np.concatenate([[0], np.cumsum(counts_u)])
    counts_i = np.bincount(i, minlength=m)
    cp = np.concatenate([[0], np.cumsum(counts_i)])

    npad = -(-n // rows) * rows
    mpad = -(-m // rows) * rows
    row_starts = np.concatenate([rp[:-1], np.full(npad - n, nnz)])
    row_ends = np.concatenate([rp[1:], np.full(npad - n, nnz)])
    col_starts = np.concatenate([cp[:-1], np.full(mpad - m, nnz)])
    col_ends = np.concatenate([cp[1:], np.full(mpad - m, nnz)])

    j = jnp.asarray
    return PallasCsr(j(row_starts.astype(np.int32)),
                     j(row_ends.astype(np.int32)),
                     j(col_starts.astype(np.int32)),
                     j(col_ends.astype(np.int32)),
                     j(i_ids), j(u_ids), j(y_pad), j(u_by_item),
                     j(item_order_p))
