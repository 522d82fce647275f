"""Device-resident training data: padded dual-sorted COO + dense tiles.

The reference walks per-user adjacency lists (hgaprec.cc:928-941). The
TPU-native layout is static-shape COO, padded to a block multiple, kept in
two sort orders so both the user-side and item-side segment reductions see
sorted segment ids:

  * user order: (u, i) lexsorted — user-side segment_sum is sorted.
  * item order: permutation `item_order` of the user-ordered arrays such
    that i_ids[item_order] is ascending — item-side segment_sum is sorted.

Padding entries carry y = 0 (they contribute nothing to any shape update)
and point at the last row of each factor table so gathers stay in bounds
and sorted order is preserved.

For the dense MXU path, `dense_y` materializes the count matrix once
(uint8, like the reference's yval_t, env.hh:20) when affordable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hgaprec_tpu.data.ratings import RatingsStore


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceData:
    # user-sorted COO, padded to P
    u_ids: jax.Array        # i32[P]
    i_ids: jax.Array        # i32[P]
    y: jax.Array            # f32[P] (0 on padding)
    # permutation into item-sorted order and the sorted item ids
    item_order: jax.Array   # i32[P]
    i_ids_sorted: jax.Array  # i32[P]
    u_ids_by_item: jax.Array  # i32[P] = u_ids[item_order]
    # optional dense count matrix for the MXU path; uint8 like the
    # reference's yval_t (env.hh:20) so Netflix-scale Y fits in HBM —
    # converted to f32 tile-by-tile inside the sweep
    dense_y: Optional[jax.Array]  # u8[N, M] or None

    @property
    def nnz_padded(self) -> int:
        return self.u_ids.shape[0]


def build_device_data(store: RatingsStore, *, pad_multiple: int = 1024,
                      dense: bool = True, dense_col_multiple: int = 4096,
                      dense_row_multiple: int = 512,
                      dense_limit_bytes: int = 10 << 30) -> DeviceData:
    """Build the static-shape device arrays from a finalized host store."""
    u = store.coo_u.astype(np.int32)
    i = store.coo_i.astype(np.int32)
    y = store.coo_y.astype(np.float32)
    n, m = store.n, store.m
    nnz = u.size
    p = max(pad_multiple, -(-max(nnz, 1) // pad_multiple) * pad_multiple)
    pad = p - nnz
    # pad with max ids so both sort orders remain ascending
    u = np.concatenate([u, np.full(pad, max(n - 1, 0), np.int32)])
    i = np.concatenate([i, np.full(pad, max(m - 1, 0), np.int32)])
    y = np.concatenate([y, np.zeros(pad, np.float32)])
    item_order = np.lexsort((u, i)).astype(np.int32)

    dense_y = None
    if dense and n * m <= dense_limit_bytes and n > 0 and m > 0:
        # rows AND columns padded at build time so the sweep tiles the
        # huge uint8 matrix in place: an in-jit pad of Y would copy the
        # multi-GB array every step, and an odd N (Netflix: 480,189)
        # would otherwise degenerate the XLA path's user tiling. Rows are
        # padded whenever N could exceed a user tile (the landmine is
        # N > user_block with a small power-of-2 divisor, any byte size).
        big = n * m > (1 << 28)
        mp = -(-m // dense_col_multiple) * dense_col_multiple if big else m
        npad = (-(-n // dense_row_multiple) * dense_row_multiple
                if (big or n > 4096) else n)
        dy = np.zeros((npad, mp), np.uint8)
        dy[store.coo_u, store.coo_i] = np.minimum(store.coo_y, 255)
        dense_y = jnp.asarray(dy)

    return DeviceData(
        u_ids=jnp.asarray(u),
        i_ids=jnp.asarray(i),
        y=jnp.asarray(y),
        item_order=jnp.asarray(item_order),
        i_ids_sorted=jnp.asarray(i[item_order]),
        u_ids_by_item=jnp.asarray(u[item_order]),
        dense_y=dense_y,
    )


def build_count_map_arrays(cmap, dtype=np.float32):
    """CountMap -> (u, i, y) arrays for device-side likelihood eval."""
    if not cmap:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, dtype))
    pairs = np.asarray(sorted(cmap.keys()), dtype=np.int32)
    vals = np.asarray([cmap[(int(a), int(b))] for a, b in pairs], dtype=dtype)
    return pairs[:, 0], pairs[:, 1], vals
