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

    a = a_ref[:]
    b = b_ref[:]
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    y = y_ref[:]
    if y.dtype == jnp.uint8:
        # Mosaic has no direct u8->f32 cast; widen through i32 (free on VPU)
        y = y.astype(jnp.int32)
    y = y.astype(jnp.float32)

    s = jnp.dot(a, b.T, preferred_element_type=jnp.float32)      # [TU, TC]
    if bf16:
        # serving config: hardware approximate reciprocal (~2^-12 rel
        # error, far below the bf16 matmul error already accepted); the
        # exact-divide chain is the kernel's VPU bottleneck, not the MXU.
        # The clamp guards y>0 cells whose dot product underflows to 0
        # in bf16 (the f32 path has the same guard); padding tiles (y=0)
        # are discarded by the select either way.
        w = jnp.where(y > 0,
                      y * pl.reciprocal(jnp.maximum(s, 1e-30), approx=True),
                      0.0)
        w = w.astype(jnp.bfloat16)
    else:
        w = jnp.where(y > 0, y / jnp.maximum(s, 1e-30), 0.0)

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
                      dense_y: jax.Array, *, bf16: bool = False,
                      tile_u: int = TILE_U, tile_c: int = TILE_C,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """(W @ B, W^T @ A) with W = Y/(A B^T) computed fully on-chip.

    a_lin: f32[N, K] linear-space user factors (exp of Elog);
    b_lin: f32[M, K]; dense_y: u8/f32[N, >=M] counts. Caller applies the
    final elementwise scaling by a_lin/b_lin.
    """
    n, k = a_lin.shape
    m = b_lin.shape[0]
    kp = -(-k // LANE) * LANE
    a = _pad_axis(_pad_axis(a_lin, kp, 1), tile_u, 0)
    b = _pad_axis(_pad_axis(b_lin, kp, 1), tile_c, 0)
    if dense_y.shape[1] > b.shape[0]:
        # Y often comes pre-padded wider than M (build-time item blocks);
        # pad B up to match rather than slicing Y — the slice would copy
        # the multi-GB uint8 matrix every step, while the extra B rows
        # meet only zero counts (w == 0) and contribute nothing
        b = _pad_axis(b, -(-dense_y.shape[1] // tile_c) * tile_c, 0)
    np_, mp = a.shape[0], b.shape[0]
    y = _pad_axis(_pad_axis(dense_y, mp, 1), tile_u, 0)

    grid = (np_ // tile_u, mp // tile_c)
    acc_a, acc_b = pl.pallas_call(
        functools.partial(_kernel, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_u, kp), lambda u, c: (u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, kp), lambda u, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_u, tile_c), lambda u, c: (u, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, kp), jnp.float32),
            jax.ShapeDtypeStruct((mp, kp), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((tile_u, kp), lambda u, c: (u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, kp), lambda u, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * np_ * mp * kp,
            bytes_accessed=np_ * mp + (np_ + 2 * mp) * kp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, y)
    return acc_a[:n, :k], acc_b[:m, :k]


def pallas_dense_ok(m: int, k: int) -> bool:
    """True when the item-side accumulator fits the VMEM budget."""
    kp = -(-k // LANE) * LANE
    mp = -(-m // TILE_C) * TILE_C
    return mp * kp * 4 <= VMEM_ACC_BUDGET
