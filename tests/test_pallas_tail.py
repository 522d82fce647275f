"""Pallas tail kernel vs the XLA MXU tail sweep (interpret mode).

The kernel restates the reference per-nonzero loop (hgaprec.cc:928-941)
with windowed DMA + a VMEM accumulator ring; these tests pin it to
ops/mxu_tail.py::mxu_tail_sweep (itself golden-tested against the f64
segment reference) on adversarial id layouts: dense runs, large id
gaps (multi-flush), single-chunk streams, and the bias-augmented path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgaprec_tpu.ops.mxu_tail import build_tail_compact, mxu_tail_sweep
from hgaprec_tpu.ops.pallas_tail import (CHUNK, SPAN, chunk_windows,
                                         pallas_tail_sweep)


def _rand_coo(rng, n, m, nnz, gap_users=False):
    u = rng.integers(0, n, nnz).astype(np.int32)
    if gap_users:
        # huge id gaps between populated bands -> many flush iterations
        u = np.where(u % 3 == 0, u, (u * 997) % n).astype(np.int32)
    i = rng.integers(0, m, nnz).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 5, nnz).astype(np.float32)
    return u, i, y


def _tables(rng, tc, k, bias):
    na, mt = tc.users.shape[0], tc.items.shape[0]
    # full-index tables sized to cover the compact ids
    n = int(np.asarray(tc.users).max()) + 1
    m = int(np.asarray(tc.items).max()) + 1
    a = jnp.asarray(rng.random((n, k)), jnp.float32) + 0.1
    b = jnp.asarray(rng.random((m, k)), jnp.float32) + 0.1
    if bias:
        ba = jnp.asarray(rng.random((n,)), jnp.float32) + 0.05
        bb = jnp.asarray(rng.random((m,)), jnp.float32) + 0.05
        return a, b, ba, bb
    return a, b, None, None


@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("gap_users", [False, True])
def test_matches_mxu_tail(bias, gap_users):
    rng = np.random.default_rng(7 + bias + 2 * gap_users)
    n, m, k, nnz = 5000, 900, 12, 3300
    u, i, y = _rand_coo(rng, n, m, nnz, gap_users=gap_users)
    tc = build_tail_compact(u, i, y)
    assert tc.w0_u is not None
    a, b, ba, bb = _tables(rng, tc, k, bias)

    ref = mxu_tail_sweep(a, b, ba, bb, tc, bf16=False)
    got = pallas_tail_sweep(a, b, ba, bb, tc, bf16=False, interpret=True)
    for r, g in zip(ref, got):
        if r is None:
            assert g is None
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("bias", [False, True])
def test_identity_primary_matches(bias):
    # every user rates: raw-id windows valid -> identity-primary path
    rng = np.random.default_rng(19)
    n, m, k = 700, 300, 10
    u = np.repeat(np.arange(n, dtype=np.int32), 4)
    i = rng.integers(0, m, u.size).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 4, u.size).astype(np.float32)
    tc = build_tail_compact(u, i, y, n_users=n)
    assert tc.w0_ur is not None            # identity metadata built
    a, b, ba, bb = _tables(rng, tc, k, bias)
    a = jnp.asarray(np.pad(np.asarray(a), ((0, n - a.shape[0]), (0, 0)),
                           constant_values=0.5))
    if bias:
        ba = jnp.asarray(np.pad(np.asarray(ba), (0, n - ba.shape[0]),
                                constant_values=0.5))
    ref = mxu_tail_sweep(a, b, ba, bb, tc, bf16=False)
    got = pallas_tail_sweep(a, b, ba, bb, tc, bf16=False, interpret=True)
    for r, g in zip(ref, got):
        if r is None:
            assert g is None
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=1e-6)


def test_single_chunk_stream():
    rng = np.random.default_rng(3)
    u, i, y = _rand_coo(rng, 200, 50, CHUNK // 2)
    tc = build_tail_compact(u, i, y)
    assert tc.cu.shape[0] == CHUNK            # one padded chunk
    a, b, _, _ = _tables(rng, tc, 8, False)
    ref = mxu_tail_sweep(a, b, None, None, tc, bf16=False)
    got = pallas_tail_sweep(a, b, None, None, tc, bf16=False,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-5, atol=1e-6)


def test_chunk_windows_invariants():
    rng = np.random.default_rng(11)
    # COMPACT sorted ids: every id in range appears, so a sorted chunk
    # of C entries spans < C rows (the invariant the kernel relies on)
    raw = np.sort(rng.integers(0, 100_000, 4 * CHUNK)).astype(np.int32)
    _, ids = np.unique(raw, return_inverse=True)
    ids = ids.astype(np.int32)
    w0, loc = chunk_windows(ids)
    assert w0.shape == (4,) and loc.shape == ids.shape
    from hgaprec_tpu.ops.pallas_tail import ALIGN
    assert (w0 % ALIGN == 0).all()
    assert loc.min() >= 0 and loc.max() < SPAN
    # reconstruction
    np.testing.assert_array_equal(np.repeat(w0, CHUNK) + loc, ids)


def test_bf16_close_to_f32():
    rng = np.random.default_rng(5)
    u, i, y = _rand_coo(rng, 3000, 400, 2100)
    tc = build_tail_compact(u, i, y)
    a, b, _, _ = _tables(rng, tc, 16, False)
    f32 = pallas_tail_sweep(a, b, None, None, tc, bf16=False,
                            interpret=True)
    bf = pallas_tail_sweep(a, b, None, None, tc, bf16=True,
                           interpret=True)
    # bf16 matmul noise only — same algorithm
    np.testing.assert_allclose(np.asarray(bf[0]), np.asarray(f32[0]),
                               rtol=3e-2, atol=3e-2)


def _hybrid_data(rng, n=60, m=45):
    from hgaprec_tpu.data.device import build_device_data
    from hgaprec_tpu.data.ratings import RatingsStore
    nnz = 600
    u = np.sort(rng.integers(0, n, nnz)).astype(np.int64)
    i = rng.integers(0, m, nnz).astype(np.int64)
    y = rng.integers(1, 4, nnz).astype(np.float64)
    store = RatingsStore(n, m)
    store.add_training(u + 1, i + 1, y)
    store.finalize()
    return build_device_data(store, pad_multiple=64, dense=False,
                             hybrid_head_items=8), store


@pytest.mark.parametrize("tail_impl,expect", [
    ("auto", "mxu"),       # off-TPU auto resolves to the portable tail
    ("mxu", "mxu"),
    ("pallas", "pallas"),  # forced -> interpret-mode kernel even on CPU
])
def test_sweep_hybrid_tail_dispatch(monkeypatch, tail_impl, expect):
    """cfg.tail_impl actually selects the implementation (advisor r4:
    the old env-var read was trace-time and untested)."""
    import hgaprec_tpu.ops.mxu_tail as mxu_mod
    import hgaprec_tpu.ops.pallas_tail as pallas_mod
    from hgaprec_tpu.ops.sweep import sweep_hybrid

    rng = np.random.default_rng(23)
    data, store = _hybrid_data(rng)
    assert data.tail_compact is not None
    k = 6
    elog_a = jnp.asarray(np.log(rng.random((store.n, k)) + 0.2))
    elog_b = jnp.asarray(np.log(rng.random((store.m, k)) + 0.2))

    called = []
    real_mxu = mxu_mod.mxu_tail_sweep
    real_pallas = pallas_mod.pallas_tail_sweep

    def spy_mxu(*a, **kw):
        called.append("mxu")
        return real_mxu(*a, **kw)

    def spy_pallas(*a, **kw):
        called.append("pallas")
        return real_pallas(*a, **kw)

    monkeypatch.setattr(mxu_mod, "mxu_tail_sweep", spy_mxu)
    monkeypatch.setattr(pallas_mod, "pallas_tail_sweep", spy_pallas)
    res = sweep_hybrid(elog_a, elog_b, None, None, data,
                       tail_impl=tail_impl, interpret=True)
    assert called == [expect]
    assert np.isfinite(np.asarray(res.acc_a)).all()


def test_identity_primary_trailing_absent_users():
    """ADVICE r4 (high): users past the last window + SPAN whose rows the
    kernel never reaches must read ZERO, not uninitialized HBM. Trailing
    10% of users absent (> SPAN ids past the stream max) while the 90%
    presence guard still builds the identity-primary metadata."""
    rng = np.random.default_rng(31)
    n, m, k = 20000, 300, 8
    n_present = 18000                       # == 0.9 * n, gap 2000 > SPAN
    u = np.repeat(np.arange(n_present, dtype=np.int32), 1)
    i = rng.integers(0, m, u.size).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 4, u.size).astype(np.float32)
    tc = build_tail_compact(u, i, y, n_users=n)
    assert tc.w0_ur is not None             # identity metadata built
    assert n - n_present > SPAN             # the adversarial regime
    a = jnp.asarray(rng.random((n, k)), jnp.float32) + 0.1
    b = jnp.asarray(rng.random((m, k)), jnp.float32) + 0.1
    acc_a, acc_b, _, _ = pallas_tail_sweep(a, b, None, None, tc,
                                           bf16=False, interpret=True)
    assert acc_a.shape == (n, k)
    # absent trailing users: exactly zero
    np.testing.assert_array_equal(np.asarray(acc_a[n_present:]), 0.0)
    # present users: match the oracle
    ref = mxu_tail_sweep(a, b, None, None, tc, bf16=False)
    np.testing.assert_allclose(np.asarray(acc_a), np.asarray(ref[0]),
                               rtol=2e-5, atol=1e-6)


def test_bf16_tail_vs_f32_mxu():
    """The serving config (Pallas tail, bf16 tables) vs the strict-f32
    MXU tail: the documented dtype-policy bound (sweep_hybrid docstring).
    One-hot selects are exact in bf16; only the K-wide FMA sees rounded
    row values, so agreement is at bf16 resolution of the accumulators."""
    rng = np.random.default_rng(41)
    u, i, y = _rand_coo(rng, 4000, 500, 6000)
    tc = build_tail_compact(u, i, y)
    a, b, _, _ = _tables(rng, tc, 16, False)
    f32 = mxu_tail_sweep(a, b, None, None, tc, bf16=False)
    bf = pallas_tail_sweep(a, b, None, None, tc, bf16=True,
                           interpret=True)
    for r, g in zip(f32[:2], bf[:2]):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.maximum(np.abs(r), 1e-3)
        assert np.max(np.abs(g - r) / denom) < 2e-2
