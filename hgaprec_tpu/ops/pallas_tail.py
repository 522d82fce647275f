"""Pallas TPU kernel for the big-sparse tail half-sweeps.

The XLA two-pass MXU tail (ops/mxu_tail.py) costs ~25 ns/nnz PER HALF
on v5e (scripts/step_decomp_probe.py, closed accounting), split by
xprof roughly 55% factor-row gather latency (2 gathers/nnz/half at
~6.9 ns/row), 25% the per-chunk HBM accumulator dynamic-update-slice
chain, 20% compute. Both overheads are artifacts of what XLA cannot
express, not of the algorithm:

  * the PRIMARY side of a sorted stream never needs a gather — a chunk
    of C nonzeros spans < C+ALIGN contiguous compact rows, i.e. ONE
    contiguous DMA;
  * the accumulator window advances monotonically, so it can live in
    VMEM and each row can be flushed to HBM exactly once — no
    read-modify-write chain through HBM.

This kernel keeps a sliding [WR, kp] f32 accumulator ring in VMEM.
Per grid step (one C-nonzero chunk of the sorted stream):

  1. DMA the primary-table window rows [w0, w0+SPAN) into VMEM
     (w0 = chunk's first id rounded down to ALIGN; sortedness bounds
     every local id in [0, SPAN)).
  2. While the new window would overflow the ring, flush the oldest
     FLUSH rows to the HBM output (each row exactly once — the stream
     is sorted, so no later chunk can touch them) and shift the ring.
  3. One-hot select the primary rows through the MXU
     (pg = G @ W, G[j, r] = [l_j == r] — exact for bf16 row values),
     recompute s = <pg, og> and w = y / s against the PRE-GATHERED
     other-side stream og (the one irreducible gather per nonzero,
     done by XLA outside the kernel as a contiguous-output gather),
     and reduce contrib = G^T @ (w * pg * og) — the same scatter-free
     one-hot segment sum as ops/mxu_tail.py, landing in the VMEM ring.

The other-side stream, ids, and weights arrive as Pallas-pipelined
VMEM blocks (hardware double buffering); only the window DMA is
manual. Per half this removes one of the two gathers and the whole
DUS chain — the two dominant costs above.

Matches the reference per-nonzero loop (hgaprec.cc:928-941) up to f32
summation order and equals ops/mxu_tail.py::mxu_tail_sweep on the
same data (tests/test_pallas_tail.py). Used by sweep_hybrid on TPU;
mxu_tail remains the portable fallback.

Measured (v5e, scripts/pallas_tail_probe.py, 8.6M-nnz EchoNest-shaped
tail, bf16): kernel halves 9.6 + 9.3 ns/nnz, og pre-gather 3.1 ns/nnz
per half, full both-sides sweep incl. table prep/expansion 32.1 ns/nnz
vs 41.4 for the XLA two-pass mxu_tail on identical data.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hgaprec_tpu.ops.mxu_tail import DEF_CHUNK, LANE, _augment

CHUNK = DEF_CHUNK      # nonzeros per window chunk (= TailCompact pad unit)
ALIGN = 256            # window bases rounded down to this many rows
                       # (hardware sweep: 8.5 ns/nnz/half at 256 vs 9.6
                       # at 512 — the smaller window cuts both one-hot
                       # matmuls by 17%)
SPAN = CHUNK + ALIGN   # primary window rows per chunk (local ids < SPAN)
FLUSH = ALIGN          # rows flushed to HBM per ring advance
WR = SPAN + FLUSH      # VMEM accumulator ring rows
RB = 8                 # chunks per grid step (Mosaic block tiling wants
                       # second-to-last block dims divisible by 8; also
                       # amortizes per-step overhead and lets window
                       # DMAs double-buffer across sub-chunks)


def chunk_windows(ids, *, chunk: int = CHUNK, align: int = ALIGN):
    """Per-chunk window bases + local ids for a sorted padded id stream.

    ids: np.i32[PT] sorted, PT % chunk == 0 (padding repeats the last
    real id, preserving both sortedness and the span bound). Returns
    (w0 i32[PT//chunk], local i32[PT]) with local in [0, chunk+align).

    Raises ValueError (not assert — validation must survive python -O)
    when the stream violates the span invariant; build_tail_compact
    catches it and skips the raw-id metadata.
    """
    import numpy as np
    if ids.size % chunk != 0:
        raise ValueError(f"id stream length {ids.size} not a multiple "
                         f"of chunk {chunk}")
    w0 = (ids[::chunk] // align) * align
    local = ids - np.repeat(w0, chunk)
    if local.min() < 0 or local.max() >= chunk + align:
        raise ValueError("sorted-chunk span invariant violated: local id "
                         f"range [{local.min()}, {local.max()}] outside "
                         f"[0, {chunk + align})")
    return w0.astype(np.int32), local.astype(np.int32)


def _kernel(w0_ref, l_ref, y_ref, og_ref, ptab_ref, out_ref,
            acc_ref, win_ref, base_ref, sems, *, mm_dtype, prec,
            align):
    """One grid step = RB sub-chunks of CHUNK nonzeros each.

    w0_ref: full-array SMEM i32[nsteps, RB]; l_ref/y_ref: VMEM blocks
    [1, RB, CHUNK]; og_ref: VMEM block [RB*CHUNK, kp]; ptab_ref/out_ref:
    HBM (manual DMA). win_ref: [2, SPAN, kp] double-buffered window
    scratch; base_ref: SMEM ring base carried across the whole grid.
    """
    ALIGN = align                # window-base / flush granularity
    SPAN = CHUNK + ALIGN
    FLUSH = ALIGN
    WR = SPAN + FLUSH
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    kp = acc_ref.shape[1]

    def win_dma(slot, step, sub):
        return pltpu.make_async_copy(
            ptab_ref.at[pl.ds(pl.multiple_of(w0_ref[step, sub], ALIGN),
                             SPAN)],
            win_ref.at[slot], sems.at[slot])

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros((WR, kp), jnp.float32)
        base_ref[0] = 0
        win_dma(0, 0, 0).start()     # warm-up fetch for sub-chunk 0

    iota_s = lax.broadcasted_iota(jnp.int32, (CHUNK, SPAN), 1)

    for s in range(RB):
        slot = s % 2
        w0 = w0_ref[c, s]

        # prefetch the next sub-chunk's window into the other buffer
        # (the last sub-chunk of the last step prefetches itself — a
        # harmless dummy to keep shapes static)
        if s + 1 < RB:
            win_dma(1 - slot, c, s + 1).start()
        else:
            nxt = jnp.minimum(c + 1, nc - 1)
            win_dma(1 - slot, nxt, 0).start()

        # flush rows the sorted stream can no longer touch, oldest
        # first — each output row is written exactly once
        def _need_flush(b):
            return w0 + SPAN > b + WR

        def _flush_one(b):
            fdma = pltpu.make_async_copy(
                acc_ref.at[0:FLUSH],
                out_ref.at[pl.ds(pl.multiple_of(b, FLUSH), FLUSH)],
                sems.at[2])
            fdma.start()
            fdma.wait()
            # shift the ring down by FLUSH rows (ascending disjoint
            # blocks so no self-overlapping VPU copy)
            for blk in range(WR // FLUSH - 1):
                acc_ref[blk * FLUSH:(blk + 1) * FLUSH, :] = (
                    acc_ref[(blk + 1) * FLUSH:(blk + 2) * FLUSH, :])
            acc_ref[WR - FLUSH:WR, :] = jnp.zeros((FLUSH, kp),
                                                  jnp.float32)
            return b + FLUSH

        base = lax.while_loop(_need_flush, _flush_one, base_ref[0])
        base_ref[0] = base

        win_dma(slot, c, s).wait()

        lloc = l_ref[0, s, :]                           # [C] i32
        y = y_ref[0, s, :]                              # [C] f32
        og = og_ref[s * CHUNK:(s + 1) * CHUNK, :].astype(jnp.float32)
        g = (lloc[:, None] == iota_s).astype(mm_dtype)  # [C, SPAN]
        pg = jnp.dot(g, win_ref[slot],
                     preferred_element_type=jnp.float32,
                     precision=prec)                    # exact row select
        prod = pg * og
        sdot = jnp.sum(prod, axis=1)
        w = y / jnp.maximum(sdot, 1e-30)                # y == 0 -> w == 0
        ph = (w[:, None] * prod).astype(mm_dtype)
        contrib = lax.dot_general(g, ph, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)       # [SPAN, kp]
        off = pl.multiple_of(w0 - base, ALIGN)          # 0 or FLUSH
        acc_ref[pl.ds(off, SPAN), :] += contrib

    @pl.when(c == nc - 1)
    def _():
        # retire the dummy self-prefetch issued by the last sub-chunk
        win_dma(1 - (RB - 1) % 2, nc - 1, 0).wait()
        b = base_ref[0]
        for i in range(WR // FLUSH):
            fdma = pltpu.make_async_copy(
                acc_ref.at[i * FLUSH:(i + 1) * FLUSH],
                out_ref.at[pl.ds(pl.multiple_of(b + i * FLUSH, FLUSH),
                                 FLUSH)],
                sems.at[2])
            fdma.start()
            fdma.wait()
        # Zero-fill every output row past the final ring: out is
        # uninitialized HBM, and identity-primary streams can leave
        # trailing primary rows (users beyond the last window + SPAN)
        # unwritten — they must read as zero contributions, not garbage.
        # om and b are both FLUSH multiples, so the loop tiles exactly.
        acc_ref[0:FLUSH, :] = jnp.zeros((FLUSH, kp), jnp.float32)
        om = out_ref.shape[0]

        def _below_om(b2):
            return b2 < om

        def _zero_fill(b2):
            fdma = pltpu.make_async_copy(
                acc_ref.at[0:FLUSH],
                out_ref.at[pl.ds(pl.multiple_of(b2, FLUSH), FLUSH)],
                sems.at[2])
            fdma.start()
            fdma.wait()
            return b2 + FLUSH

        lax.while_loop(_below_om, _zero_fill, b + WR)


@functools.partial(jax.jit,
                   static_argnames=("np_rows", "interpret", "bf16",
                                    "align"))
def pallas_half_sweep(p_tab: jax.Array, og: jax.Array, local: jax.Array,
                      w0: jax.Array, y: jax.Array, *, np_rows: int,
                      bf16: bool = False, align: int = ALIGN,
                      interpret: bool = False) -> jax.Array:
    """One half-sweep: accumulate y*phi onto the sorted (primary) side.

    p_tab: [NP', kp] compact primary factor table in the matmul dtype
    (callers pass NP' >= np_rows; padded here to cover every window);
    og: [PT, kp] other-side rows pre-gathered in this order; local:
    i32[PT] primary ids relative to their chunk window; w0: i32[NCH]
    window bases; y: f32[PT] counts (0 on padding). Returns
    f32[np_rows, kp] accumulated sums (cf. mxu_tail._half_sweep).
    """
    pt = og.shape[0]
    kp = p_tab.shape[1]
    assert pt % CHUNK == 0 and kp % LANE == 0
    nch = pt // CHUNK
    assert w0.shape[0] == nch and local.shape[0] == pt
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    prec = None if bf16 else lax.Precision.HIGHEST
    og = og.astype(mm_dtype)
    span = CHUNK + align
    flush = align
    wr = span + flush

    # pad the chunk count to an RB multiple (dummy chunks repeat the
    # last window with y = 0, contributing nothing)
    if nch % RB:
        ext = RB - nch % RB
        w0 = jnp.concatenate([w0, jnp.broadcast_to(w0[-1], (ext,))])
        local = jnp.concatenate(
            [local, jnp.zeros((ext * CHUNK,), local.dtype)])
        y = jnp.concatenate([y, jnp.zeros((ext * CHUNK,), y.dtype)])
        og = jnp.concatenate(
            [og, jnp.zeros((ext * CHUNK, kp), og.dtype)])
        nch += ext
        pt = nch * CHUNK
    nsteps = nch // RB

    # pad the table so every [w0, w0+SPAN) window is in bounds, and the
    # output so the final ring flush ([base, base+WR)) is in bounds
    tab_rows = -(-max(np_rows, 1) // align) * align + span
    if p_tab.shape[0] < tab_rows:
        p_tab = jnp.pad(p_tab, ((0, tab_rows - p_tab.shape[0]), (0, 0)))
    om = -(-max(np_rows, 1) // flush) * flush + wr

    out = pl.pallas_call(
        functools.partial(_kernel, mm_dtype=mm_dtype, prec=prec,
                          align=align),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # w0, full array
            pl.BlockSpec((1, RB, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB * CHUNK, kp), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((om, kp), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((wr, kp), jnp.float32),
            pltpu.VMEM((2, span, kp), mm_dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nch * 2 * 2 * CHUNK * span * kp,
            bytes_accessed=(pt * kp * (2 if bf16 else 4) * 2
                            + np_rows * kp * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w0.reshape(nsteps, RB), local.reshape(nsteps, RB, CHUNK),
      y.reshape(nsteps, RB, CHUNK), og, p_tab)
    return out[:np_rows]


def pallas_tail_sweep(a_lin: jax.Array, b_lin: jax.Array,
                      ba_lin: Optional[jax.Array],
                      bb_lin: Optional[jax.Array],
                      tc, *, bf16: bool = False,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array,
                                 Optional[jax.Array], Optional[jax.Array]]:
    """Drop-in replacement for mxu_tail_sweep using the Pallas kernel.

    Requires a TailCompact built with window metadata (w0_u is not
    None). Same contract and numerics (up to f32 summation order):
    returns (acc_a [N,K], acc_b [M,K], acc_ba [N]|None, acc_bb [M]|None).
    """
    n, k = a_lin.shape
    m = b_lin.shape[0]
    bias = ba_lin is not None
    kaug = k + 2 if bias else k
    kp = -(-kaug // LANE) * LANE
    na = tc.users.shape[0]
    mt = tc.items.shape[0]
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # identity-primary user side: nearly every user is in the tail, so
    # run the kernel on the FULL user table with raw-id windows — no
    # compact-table gather, no scatter re-expansion of the result
    ident_u = tc.w0_ur is not None

    ones_b = jnp.ones((mt,), b_lin.dtype) if bias else None
    if ident_u:
        ones_a = jnp.ones((n,), a_lin.dtype) if bias else None
        a_t = _augment(a_lin, ba_lin, ones_a, kp)
    else:
        ones_a = jnp.ones((na,), a_lin.dtype) if bias else None
        a_t = _augment(a_lin[tc.users],
                       ba_lin[tc.users] if bias else None, ones_a, kp)
    b_t = _augment(b_lin[tc.items], ones_b,
                   bb_lin[tc.items] if bias else None, kp)
    a_t = a_t.astype(mm_dtype)
    b_t = b_t.astype(mm_dtype)

    # the one gather per nonzero per half: the UNSORTED side's rows,
    # materialized contiguous so the kernel streams them
    og_u = b_t[tc.ci]
    if ident_u:
        acc_a_c = pallas_half_sweep(a_t, og_u, tc.l_ur, tc.w0_ur, tc.y,
                                    np_rows=n, bf16=bf16,
                                    interpret=interpret)
        og_i = a_t[tc.u_i_raw]
        acc_a = acc_a_c[:, :k]
    else:
        acc_a_c = pallas_half_sweep(a_t, og_u, tc.l_u, tc.w0_u, tc.y,
                                    np_rows=na, bf16=bf16,
                                    interpret=interpret)
        og_i = a_t[tc.cu_i]
        acc_a = jnp.zeros((n, k), jnp.float32).at[tc.users].set(
            acc_a_c[:, :k], unique_indices=True, indices_are_sorted=True, mode="drop")
    acc_b_c = pallas_half_sweep(b_t, og_i, tc.l_i, tc.w0_i, tc.y_i,
                                np_rows=mt, bf16=bf16, interpret=interpret)

    acc_b = jnp.zeros((m, k), jnp.float32).at[tc.items].set(
        acc_b_c[:, :k], unique_indices=True, indices_are_sorted=True, mode="drop")
    if bias:
        if ident_u:
            acc_ba = acc_a_c[:, k]
        else:
            acc_ba = jnp.zeros((n,), jnp.float32).at[tc.users].set(
                acc_a_c[:, k], unique_indices=True,
                indices_are_sorted=True, mode="drop")
        acc_bb = jnp.zeros((m,), jnp.float32).at[tc.items].set(
            acc_b_c[:, k + 1], unique_indices=True,
            indices_are_sorted=True, mode="drop")
        return acc_a, acc_b, acc_ba, acc_bb
    return acc_a, acc_b, None, None
