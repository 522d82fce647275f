"""MXU tail sweep == segment sweep on the same COO stream.

The compact-id slab/one-hot-matmul formulation (ops/mxu_tail.py) must
reproduce the gather/segment-sum sweep (the correctness baseline pinned
to the reference loop, hgaprec.cc:928-941) exactly up to f32 summation
order.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hgaprec_tpu.data.device import DeviceData, build_device_data
from hgaprec_tpu.ops.mxu_tail import build_tail_compact, mxu_tail_sweep
from hgaprec_tpu.ops.sweep import sweep_segment


def _coo(rng, n, m, nnz):
    """Deduplicated user-sorted COO with power-law-ish marginals."""
    u = rng.integers(0, n, nnz)
    i = np.minimum((m * rng.power(2.0, nnz)).astype(np.int64), m - 1)
    key = u * m + i
    order = np.argsort(key, kind="stable")
    key = key[order]
    keep = np.concatenate([[True], key[1:] != key[:-1]])
    u, i = u[order][keep], i[order][keep]
    y = rng.integers(1, 6, u.size).astype(np.float32)
    return u.astype(np.int32), i.astype(np.int32), y


def _segment_data(u, i, y, n, m):
    order = np.argsort(i, kind="stable").astype(np.int32)
    j = jnp.asarray
    return DeviceData(u_ids=j(u), i_ids=j(i), y=j(y),
                      item_order=j(order), i_ids_sorted=j(i[order]),
                      u_ids_by_item=j(u[order]), dense_y=None)


@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("chunk", [64, 256])
def test_matches_segment(bias, chunk):
    rng = np.random.default_rng(11)
    n, m, k = 173, 91, 9
    u, i, y = _coo(rng, n, m, 1200)
    elog_a = jnp.asarray(rng.normal(-0.5, 0.4, (n, k)), jnp.float32)
    elog_b = jnp.asarray(rng.normal(-0.5, 0.4, (m, k)), jnp.float32)
    eba = jnp.asarray(rng.normal(-1.0, 0.3, (n,)), jnp.float32) if bias \
        else None
    ebb = jnp.asarray(rng.normal(-1.0, 0.3, (m,)), jnp.float32) if bias \
        else None

    ref = sweep_segment(elog_a, elog_b, eba, ebb,
                        _segment_data(u, i, y, n, m))

    tc = build_tail_compact(u, i, y, pad_multiple=chunk)
    acc_a, acc_b, acc_ba, acc_bb = mxu_tail_sweep(
        jnp.exp(elog_a), jnp.exp(elog_b),
        jnp.exp(eba) if bias else None,
        jnp.exp(ebb) if bias else None, tc, chunk=chunk)

    np.testing.assert_allclose(acc_a, ref.acc_a, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(acc_b, ref.acc_b, rtol=2e-5, atol=1e-6)
    if bias:
        np.testing.assert_allclose(acc_ba, ref.acc_bias_a, rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(acc_bb, ref.acc_bias_b, rtol=2e-5,
                                   atol=1e-6)


def test_inactive_rows_zero():
    """Users/items absent from the stream get exactly-zero accumulators."""
    rng = np.random.default_rng(3)
    n, m, k = 50, 40, 4
    u = np.asarray([3, 3, 7, 20, 20, 20, 49], np.int32)
    i = np.asarray([1, 5, 2, 0, 9, 39, 9], np.int32)
    y = np.asarray([1, 2, 3, 1, 1, 4, 2], np.float32)
    elog_a = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    elog_b = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    tc = build_tail_compact(u, i, y, pad_multiple=16)
    acc_a, acc_b, _, _ = mxu_tail_sweep(jnp.exp(elog_a), jnp.exp(elog_b),
                                        None, None, tc, chunk=16)
    active_u = np.zeros(n, bool)
    active_u[u] = True
    active_i = np.zeros(m, bool)
    active_i[i] = True
    assert np.all(np.asarray(acc_a)[~active_u] == 0)
    assert np.all(np.asarray(acc_b)[~active_i] == 0)
    assert np.all(np.asarray(acc_a)[u].sum(1) > 0)

    ref = sweep_segment(elog_a, elog_b, None, None,
                        _segment_data(u, i, y, n, m))
    np.testing.assert_allclose(acc_a, ref.acc_a, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(acc_b, ref.acc_b, rtol=2e-5, atol=1e-6)


def test_hybrid_uses_compact_tail():
    """build_device_data builds the compact tail; hybrid sweep over it
    equals the pure segment sweep over the full stream."""
    from hgaprec_tpu.data.ratings import RatingsStore
    from hgaprec_tpu.ops.sweep import sweep_hybrid

    rng = np.random.default_rng(5)
    k = 6
    u, i, y = _coo(rng, 96, 70, 900)
    store = RatingsStore(96, 70)
    store.add_training(u.tolist(), i.tolist(), y.tolist())
    store.finalize()
    n, m = store.n, store.m   # remapped seq-id space
    data = build_device_data(store, pad_multiple=64, dense=False,
                             hybrid_head_items=16)
    assert data.tail_compact is not None

    elog_a = jnp.asarray(rng.normal(-0.5, 0.4, (n, k)), jnp.float32)
    elog_b = jnp.asarray(rng.normal(-0.5, 0.4, (m, k)), jnp.float32)
    res = sweep_hybrid(elog_a, elog_b, None, None, data, interpret=True)
    ref = sweep_segment(elog_a, elog_b, None, None,
                        _segment_data(store.coo_u, store.coo_i,
                                      store.coo_y.astype(np.float32),
                                      n, m))
    np.testing.assert_allclose(res.acc_a, ref.acc_a, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(res.acc_b, ref.acc_b, rtol=2e-4, atol=1e-5)
