"""Multi-chip CAVI: user-row data parallelism over a device mesh.

The reference is single-process, single-threaded (SURVEY §5: no MPI/NCCL
anywhere; pthread linked but unused). This layer is the TPU-native
parallel design built from scratch:

  * 1-D mesh axis "d" over all chips (ICI within a host, DCN across
    hosts via jax.distributed — the collectives below are emitted by XLA
    from the same code either way).
  * theta-side state (theta, xi, theta_bias, theta_mle) row-sharded over
    "d"; beta-side state replicated.
  * training nonzeros partitioned by user block and padded to equal
    per-device counts; u_ids are *local* row indices.
  * the only cross-device traffic per iteration: psum of the item-side
    shape accumulators ([M, K] — rides ICI) and of K-length user-axis
    colsums. This is the exact communication lower bound for CAVI's
    coupling structure (all cross-shard dependencies are the factor sums,
    hgaprec.cc:944-953, 1398-1411).

Implemented with shard_map over the same `cavi_step` used on one chip
(axis_name/row_mask parameters), so single-chip and sharded paths cannot
drift apart.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hgaprec_tpu.config import ModelConfig
from hgaprec_tpu.data.device import DeviceData
from hgaprec_tpu.data.ratings import RatingsStore
from hgaprec_tpu.models.state import Gam, ModelState, init_state
from hgaprec_tpu.models.step import cavi_step

AXIS = "d"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _pad_to(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


@dataclasses.dataclass
class ShardedRun:
    mesh: Mesh
    cfg: ModelConfig          # with n == padded row count
    true_n: int
    n_local: int
    data: DeviceData          # leaves sharded over axis 0 ("d")
    row_mask: jax.Array       # f32[n_padded] sharded
    state: ModelState         # theta-side sharded, beta-side replicated
    step_fn: object
    multi_step_fn: object = None

    def step(self):
        self.state = self.step_fn(self.state, self.data, self.row_mask)
        return self.state

    def multi_step(self, n_steps: int):
        """n_steps sharded CAVI iterations in one dispatch (fori_loop over
        the shard_mapped step; trip count is a traced scalar)."""
        self.state = self.multi_step_fn(self.state, self.data,
                                        self.row_mask, jnp.int32(n_steps))
        return self.state

    def unsharded_state(self) -> ModelState:
        """Gather to host and strip padding rows (for eval/checkpoint)."""
        n = self.true_n

        def fix(g: Optional[Gam], user_side: bool) -> Optional[Gam]:
            if g is None:
                return None
            if not user_side:
                return g
            return Gam(*[jnp.asarray(np.asarray(x)[:n])
                         for x in (g.shape, g.rate, g.e, g.elog)])

        st = self.state
        return ModelState(
            theta=fix(st.theta, True), beta=fix(st.beta, False),
            theta_rate=fix(st.theta_rate, True),
            beta_rate=fix(st.beta_rate, False),
            theta_bias=fix(st.theta_bias, True),
            beta_bias=fix(st.beta_bias, False),
            theta_mle=(None if st.theta_mle is None else
                       jnp.asarray(np.asarray(st.theta_mle)[:n])),
            beta_mle=st.beta_mle,
            theta_prior_e=(None if st.theta_prior_e is None else
                           jnp.asarray(np.asarray(st.theta_prior_e)[:n])),
            theta_prior_elog=(None if st.theta_prior_elog is None else
                              jnp.asarray(np.asarray(st.theta_prior_elog)[:n])),
            beta_prior_e=st.beta_prior_e,
            beta_prior_elog=st.beta_prior_elog)


def build_sharded_data(store: RatingsStore, n_padded: int, mesh: Mesh,
                       *, pad_multiple: int = 256, dense: bool = True,
                       dense_limit_bytes: int = 10 << 30) -> DeviceData:
    """Partition training nonzeros by user block; local ids, equal pads."""
    ndev = mesh.devices.size
    n_local = n_padded // ndev
    m = store.m
    u, i, y = store.coo_u, store.coo_i, store.coo_y
    shard_of = u // n_local
    per_shard = []
    max_len = 0
    for d in range(ndev):
        sel = shard_of == d
        uu = (u[sel] - d * n_local).astype(np.int32)
        ii = i[sel].astype(np.int32)
        yy = y[sel].astype(np.float32)
        per_shard.append((uu, ii, yy))
        max_len = max(max_len, uu.size)
    p_local = max(pad_multiple,
                  -(-max(max_len, 1) // pad_multiple) * pad_multiple)

    us, is_, ys, orders, isorted, ubyitem = [], [], [], [], [], []
    dense_rows = []
    want_dense = dense and n_padded * m <= dense_limit_bytes and m > 0
    for d, (uu, ii, yy) in enumerate(per_shard):
        pad = p_local - uu.size
        uu2 = np.concatenate([uu, np.full(pad, n_local - 1, np.int32)])
        ii2 = np.concatenate([ii, np.full(pad, max(m - 1, 0), np.int32)])
        yy2 = np.concatenate([yy, np.zeros(pad, np.float32)])
        order = np.lexsort((uu2, ii2)).astype(np.int32)
        us.append(uu2)
        is_.append(ii2)
        ys.append(yy2)
        orders.append(order)
        isorted.append(ii2[order])
        ubyitem.append(uu2[order])
        if want_dense:
            dy = np.zeros((n_local, m), np.uint8)
            dy[uu, ii] = np.minimum(yy, 255).astype(np.uint8)
            dense_rows.append(dy)

    def shard_arr(parts, spec):
        host = np.concatenate(parts, axis=0)
        return jax.device_put(
            host, NamedSharding(mesh, spec))

    dense_y = None
    if want_dense:
        dense_y = shard_arr(dense_rows, P(AXIS, None))
    return DeviceData(
        u_ids=shard_arr(us, P(AXIS)),
        i_ids=shard_arr(is_, P(AXIS)),
        y=shard_arr(ys, P(AXIS)),
        item_order=shard_arr(orders, P(AXIS)),
        i_ids_sorted=shard_arr(isorted, P(AXIS)),
        u_ids_by_item=shard_arr(ubyitem, P(AXIS)),
        dense_y=dense_y,
    )


def _state_specs(cfg: ModelConfig):
    """PartitionSpecs per state leaf: theta-side sharded, beta replicated."""
    row = P(AXIS)
    mat = P(AXIS, None)
    rep1 = P(None)
    rep2 = P(None, None)
    # theta-side
    theta = Gam(shape=mat, rate=(mat if cfg.hier else rep1), e=mat, elog=mat)
    beta = Gam(shape=rep2, rate=(rep2 if cfg.hier else rep1), e=rep2,
               elog=rep2)
    return ModelState(
        theta=theta, beta=beta,
        theta_rate=(Gam(row, row, row, row) if cfg.hier else None),
        beta_rate=(Gam(rep1, rep1, rep1, rep1) if cfg.hier else None),
        theta_bias=(Gam(row, row, row, row) if cfg.bias else None),
        beta_bias=(Gam(rep1, rep1, rep1, rep1) if cfg.bias else None),
        theta_mle=(mat if cfg.variant == "mle_user" else None),
        beta_mle=(rep2 if cfg.variant in ("mle_item", "canny") else None),
        theta_prior_e=(row if cfg.hier else None),
        theta_prior_elog=(row if cfg.hier else None),
        beta_prior_e=(rep1 if cfg.hier else None),
        beta_prior_elog=(rep1 if cfg.hier else None))


def _data_specs(data: DeviceData):
    return DeviceData(
        u_ids=P(AXIS), i_ids=P(AXIS), y=P(AXIS), item_order=P(AXIS),
        i_ids_sorted=P(AXIS), u_ids_by_item=P(AXIS),
        dense_y=(None if data.dense_y is None else P(AXIS, None)))


def build_sharded_run(store: RatingsStore, cfg: ModelConfig,
                      mesh: Optional[Mesh] = None, seed: int = 0,
                      pad_multiple: int = 256,
                      dense: Optional[bool] = None) -> ShardedRun:
    mesh = mesh or make_mesh()
    ndev = mesh.devices.size
    n = store.n
    n_padded = -(-n // ndev) * ndev
    n_local = n_padded // ndev
    # NB: the step math must see the TRUE n (e.g. the bias rate constant is
    # 0.3 + n, hgaprec.cc:1265-1270); padding is purely an array-shape
    # concern handled by row_mask.
    pcfg = dataclasses.replace(cfg, n=n_padded)
    if dense is None:
        dense = pcfg.resolve_sweep() == "dense"

    data = build_sharded_data(store, n_padded, mesh,
                              pad_multiple=pad_multiple, dense=dense)

    # init on host at true n, pad rows, then place with shardings
    state0 = init_state(dataclasses.replace(cfg, n=n), seed=seed)
    specs = _state_specs(pcfg)

    def place(x, spec):
        if x is None:
            return None
        arr = np.asarray(x)
        if spec is not None and len(spec) >= 1 and spec[0] == AXIS \
                and arr.shape[0] == n:
            arr = _pad_to(arr, n_padded)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    state = jax.tree.map(place, state0, specs,
                         is_leaf=lambda x: x is None or isinstance(x, (jax.Array, np.ndarray)))

    mask_host = (np.arange(n_padded) < n).astype(np.float32)
    row_mask = jax.device_put(mask_host, NamedSharding(mesh, P(AXIS)))
    # (padded init rows are zero already — _pad_to pads with zeros, so their
    # expectations contribute nothing to the first sweep's reductions)

    dspecs = _data_specs(data)
    local_mask_spec = P(AXIS)

    local_fn = jax.shard_map(
        functools.partial(_local_step, cfg=cfg),
        mesh=mesh,
        in_specs=(specs, dspecs, local_mask_spec),
        out_specs=specs,
        check_vma=False)

    @jax.jit
    def step_fn(state, data, row_mask):
        return local_fn(state, data, row_mask)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step_fn(state, data, row_mask, n_steps):
        def body(_, s):
            return local_fn(s, data, row_mask)
        return jax.lax.fori_loop(0, n_steps, body, state)

    return ShardedRun(mesh=mesh, cfg=pcfg, true_n=n, n_local=n_local,
                      data=data, row_mask=row_mask, state=state,
                      step_fn=step_fn, multi_step_fn=multi_step_fn)


def _local_step(state, data, row_mask, *, cfg):
    return cavi_step(state, data, cfg, axis_name=AXIS, row_mask=row_mask)


# -- item-sharded ranking eval ----------------------------------------------
#
# SURVEY §2.3(4): the ranking matmul + top-k sharded over the item axis —
# each device scores its item shard for the evaluated users, masks
# train/validation entries, takes a local top-k, and an all_gather + merge
# yields the global top-k. The K-vector user factors ride to every chip
# replicated; only [ndev, S, k] candidate lists cross the ICI.


def sharded_masked_topk(sc, mesh: Mesh, users: np.ndarray,
                        mask_cols: np.ndarray, k: int = 100):
    """Global masked top-k with items sharded over the mesh.

    sc: eval.score.Scorer; users: i64[S]; mask_cols: i32[S, D] global item
    ids to force to score 0.0 (reference semantics, hgaprec.cc:1729-1737),
    padded with out-of-range values. Returns (vals f32[S, k], ids i32[S, k]).
    """
    ndev = mesh.devices.size
    m, kdim = sc.sv.shape
    m_pad = -(-m // ndev) * ndev
    m_local = m_pad // ndev
    k_local = min(k, m_local)

    sv = jax.device_put(_pad_to(np.asarray(sc.sv), m_pad),
                        NamedSharding(mesh, P(AXIS, None)))
    bias = sc.bias_u is not None
    bi = (jax.device_put(_pad_to(np.asarray(sc.bias_i), m_pad),
                         NamedSharding(mesh, P(AXIS)))
          if bias else jax.device_put(np.zeros(m_pad, np.float32),
                                      NamedSharding(mesh, P(AXIS))))
    su_users = np.asarray(sc.su)[np.asarray(users)]
    bu_users = (np.asarray(sc.bias_u)[np.asarray(users)] if bias
                else np.zeros(len(users), np.float32))
    rep = NamedSharding(mesh, P(None, None))
    su_users = jax.device_put(su_users.astype(np.float32), rep)
    bu_users = jax.device_put(bu_users.astype(np.float32),
                              NamedSharding(mesh, P(None)))
    mask_dev = jax.device_put(np.asarray(mask_cols, np.int32), rep)
    off = float(sc.global_off)

    def local(sv_l, bi_l, su_u, bu_u, mask):
        d = jax.lax.axis_index(AXIS)
        c0 = d * m_local
        scores = jnp.dot(su_u, sv_l.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        if bias:
            scores = scores + bu_u[:, None] + bi_l[None, :]
        scores = scores + off
        col_ids = c0 + jnp.arange(m_local, dtype=jnp.int32)
        scores = jnp.where(col_ids[None, :] < m, scores, -1.0)
        local_cols = mask - c0
        local_cols = jnp.where((local_cols >= 0) & (local_cols < m_local),
                               local_cols, m_local + 7)
        rows = jnp.broadcast_to(
            jnp.arange(scores.shape[0], dtype=jnp.int32)[:, None],
            mask.shape)
        scores = scores.at[rows, local_cols].set(0.0, mode="drop")
        v, i = jax.lax.top_k(scores, k_local)
        ids = col_ids[i]
        # [ndev, S, k_local] on every chip
        av = jax.lax.all_gather(v, AXIS)
        ai = jax.lax.all_gather(ids, AXIS)
        s_count = av.shape[1]
        av = jnp.transpose(av, (1, 0, 2)).reshape(s_count, -1)
        ai = jnp.transpose(ai, (1, 0, 2)).reshape(s_count, -1)
        kk = min(k, av.shape[1])
        v2, sel = jax.lax.top_k(av, kk)
        return v2, jnp.take_along_axis(ai, sel, axis=1)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(None, None), P(None),
                  P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False))
    vals, ids = fn(sv, bi, su_users, bu_users, mask_dev)
    return np.asarray(vals), np.asarray(ids)
