"""Fused Pallas TPU kernel for the dense-blocked CAVI sweep.

The XLA dense path (ops/sweep.py::sweep_dense) restates the reference
hot loop (hgaprec.cc:928-941) as SDDMM + two SpMMs but materializes the
per-tile weight matrix W = Y / (A B^T) through HBM between the matmuls;
at Netflix scale that round trip is the dominant HBM traffic. This
kernel fuses the whole per-tile pipeline in VMEM, flash-attention
style — W never exists outside the chip:

  grid = (user_tiles, item_tiles), item axis fastest
  per step:   s    = A_u @ B_c^T                     (MXU)
              w    = where(y>0, y / s, 0)            (VPU, y is uint8)
              accA_u += w @ B_c                      (MXU)
              accB_c += w^T @ A_u                    (MXU)

  accA block is indexed by the slow grid axis, so it stays resident in
  VMEM across the item sweep; accB is a full [M_pad, Kp] VMEM-resident
  output (constant index map), initialized on the first user tile.

HBM traffic per iteration = one uint8 read of Y + A once + B re-read
per user tile + the two accumulator writebacks. VMEM condition: the
full item-side accumulator (and one B tile) must fit on chip —
M_pad * Kp * 4 bytes, e.g. Netflix 17920 x 128 ~ 9.2 MB of ~16 MB.
Catalogs past ~24k items (NYT 107k, EchoNest 385k) stream this kernel
over item chunks from XLA (acc_a adds across chunks; acc_b concats).

Returns the same accumulators as sweep_dense (no-bias path): the
linear-space sums of y*phi, i.e. acc_a = A .* (W B), acc_b = B .* (W^T A)
with the elementwise scaling applied by the caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_U = 512    # user rows per grid step (tile probe: best at 512)
TILE_C = 512    # item cols per grid step

# full item-side accumulator + one B tile must fit beside the working set
VMEM_ACC_BUDGET = 10 << 20


def _kernel(a_ref, b_ref, y_ref, acc_a_ref, acc_b_ref, *, bf16: bool):
    u = pl.program_id(0)
    c = pl.program_id(1)
    tc = b_ref.shape[0]

    # a/b arrive already in the matmul dtype (bf16 serving casts happen
    # once per iteration in XLA, not per tile on the VPU — and halve the
    # HBM traffic of the per-user-tile B re-reads). Bias variants arrive
    # with the bias expectations packed into the lane-padding columns
    # (a = [A | ba | 1 | 0...], b = [B | 1 | bb | 0...]) so the score
    # s = A@B^T + ba + bb (prediction_score, hgaprec.cc:1850-1891) and
    # the bias shape statistics rowsum(w)/colsum(w) all ride the SAME
    # three matmuls on otherwise-idle MXU lanes — the kernel itself is
    # bias-agnostic and pays zero extra VPU passes.
    a = a_ref[:]
    b = b_ref[:]
    y = y_ref[:]
    if y.dtype == jnp.uint8:
        # Mosaic has no direct u8->f32 cast; widen through i32 (free on VPU)
        y = y.astype(jnp.int32)
    y = y.astype(jnp.float32)

    s = jnp.dot(a, b.T, preferred_element_type=jnp.float32)      # [TU, TC]
    # Select-free weight: after the clamp the reciprocal is finite, so
    # y == 0 cells (including every padding row/column) give w == 0
    # exactly — no compare/select pass over the [TU, TC] tile. The clamp
    # also guards y>0 cells whose dot product underflows to 0.
    sc = jnp.maximum(s, 1e-30)
    if bf16:
        # serving config: hardware approximate reciprocal (~2^-12 rel
        # error, far below the bf16 matmul error already accepted); the
        # exact-divide chain is the kernel's VPU bottleneck, not the MXU.
        w = (y * pl.reciprocal(sc, approx=True)).astype(jnp.bfloat16)
    else:
        w = y / sc

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


def _pad_axis(x: jax.Array, mult: int, axis: int) -> jax.Array:
    size = x.shape[axis]
    pad = -(-size // mult) * mult - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("bf16", "tile_u", "tile_c",
                                             "interpret"))
def fused_dense_sweep(a_lin: jax.Array, b_lin: jax.Array,
                      dense_y: jax.Array, ba_lin=None, bb_lin=None,
                      *, bf16: bool = False,
                      tile_u: int = TILE_U, tile_c: int = TILE_C,
                      interpret: bool = False) -> Tuple[jax.Array, ...]:
    """(W @ B, W^T @ A[, rowsum W, colsum W]) with W = Y/(A B^T [+ biases])
    computed fully on-chip.

    a_lin: f32[N, K] linear-space user factors (exp of Elog);
    b_lin: f32[M, K]; dense_y: u8/f32[>=N, >=M] counts (rows/cols may be
    zero-padded at build time — see data/device.py); ba_lin/bb_lin:
    optional f32[N]/f32[M] linear-space bias expectations (the K+1/K+2
    phi slots, hgaprec.cc:223-239). Caller applies the final elementwise
    scaling by a_lin/b_lin (and ba/bb). Returns 2 or 4 accumulators.
    """
    n, k = a_lin.shape
    m = b_lin.shape[0]
    bias = ba_lin is not None
    kaug = k + 2 if bias else k
    kp = -(-kaug // LANE) * LANE
    if bias:
        # pack the bias expectations into the lane-padding columns:
        # a = [A | ba | 1], b = [B | 1 | bb]. The kernel's score matmul
        # then includes ba + bb, and its contrib matmuls deliver
        # rowsum(w) in acc_a[:, k] (w @ ones-col of b) and colsum(w) in
        # acc_b[:, k+1] — bias statistics on otherwise-idle MXU lanes,
        # zero extra VPU work (cf. ops/mxu_tail._augment, same layout;
        # reference: the K+1/K+2 phi slots, hgaprec.cc:223-239)
        ones_a = jnp.ones((n, 1), a_lin.dtype)
        ones_b = jnp.ones((m, 1), b_lin.dtype)
        a_lin = jnp.concatenate(
            [a_lin, ba_lin.reshape(-1, 1), ones_a], axis=1)
        b_lin = jnp.concatenate(
            [b_lin, ones_b, bb_lin.reshape(-1, 1)], axis=1)
    if bf16:
        # cast once here (XLA, fused with the upstream exp) rather than
        # per tile in the kernel; bf16 B also halves the dominant B
        # re-read HBM traffic (B streams through VMEM once per user tile).
        # NB in the bias variant this also rounds ba/bb (packed into the
        # lane-padding columns above) and the rowsum/colsum(w) bias
        # statistics to bf16 inputs — accepted serving-config error
        # < 2e-2 relative (tests/test_dense_pallas.py::
        # test_fused_bias_bf16_close_to_f32), same bound as the factor
        # accumulators.
        a_lin = a_lin.astype(jnp.bfloat16)
        b_lin = b_lin.astype(jnp.bfloat16)
    a = _pad_axis(_pad_axis(a_lin, kp, 1), tile_u, 0)
    b = _pad_axis(_pad_axis(b_lin, kp, 1), tile_c, 0)
    if dense_y.shape[1] > b.shape[0]:
        # Y often comes pre-padded wider than M (build-time item blocks);
        # pad B up to match rather than slicing Y — the slice would copy
        # the multi-GB uint8 matrix every step, while the extra B rows
        # meet only zero counts (w == 0) and contribute nothing
        b = _pad_axis(b, -(-dense_y.shape[1] // tile_c) * tile_c, 0)
    np_, mp = a.shape[0], b.shape[0]
    if dense_y.shape[0] > np_:
        # Y rows pre-padded past N at build time: pad A up to match
        a = _pad_axis(a, -(-dense_y.shape[0] // tile_u) * tile_u, 0)
        np_ = a.shape[0]
    y = _pad_axis(_pad_axis(dense_y, mp, 1), tile_u, 0)

    grid = (np_ // tile_u, mp // tile_c)
    in_specs = [
        pl.BlockSpec((tile_u, kp), lambda u, c: (u, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_c, kp), lambda u, c: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((np_, kp), jnp.float32),
        jax.ShapeDtypeStruct((mp, kp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((tile_u, kp), lambda u, c: (u, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mp, kp), lambda u, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [a, b]
    operands.append(y)
    in_specs.append(pl.BlockSpec((tile_u, tile_c), lambda u, c: (u, c),
                                 memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_kernel, bf16=bf16),
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=6 * np_ * mp * kp,
            bytes_accessed=np_ * mp + (np_ + 2 * mp) * kp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    acc_a, acc_b = outs
    if bias:
        # rowsum(w) rode b's ones column (k); colsum(w) rode a's (k+1)
        return (acc_a[:n, :k], acc_b[:m, :k],
                acc_a[:n, k], acc_b[:m, k + 1])
    return acc_a[:n, :k], acc_b[:m, :k]


def pallas_dense_ok(m: int, k: int) -> bool:
    """True when the item-side accumulator fits the VMEM budget."""
    kp = -(-k // LANE) * LANE
    mp = -(-m // TILE_C) * TILE_C
    return mp * kp * 4 <= VMEM_ACC_BUDGET
