"""Hardware-only Pallas tail regression tests (VERDICT r4 #7).

The interpret-mode tests in test_pallas_tail.py pin the kernel's
semantics but never execute the real Mosaic lowering — the windowed
DMA ring, semaphores, VMEM budget, and the final zero-fill flush only
run on a TPU. This suite runs the compiled kernel on a ~100k-nnz
stream so a Mosaic/VMEM regression (like the f32 variant's OOM, found
the expensive way in a 40-minute bench run) is caught by `pytest` in
the TPU environment instead.

Run on hardware:  HGAPREC_TEST_TPU=1 python -m pytest \
    tests/test_pallas_tail_hw.py -q
(conftest forces CPU otherwise; skipped automatically off-TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="executes the compiled Mosaic kernel; TPU only")


def _stream(rng, n, m, nnz):
    u = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    i = rng.integers(0, m, nnz).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 5, nnz).astype(np.float32)
    return u, i, y


@pytest.mark.parametrize("bias", [False, True])
def test_pallas_vs_mxu_on_hardware(bias):
    from hgaprec_tpu.ops.mxu_tail import build_tail_compact, mxu_tail_sweep
    from hgaprec_tpu.ops.pallas_tail import pallas_tail_sweep

    rng = np.random.default_rng(57)
    n, m, k, nnz = 50_000, 8_000, 100, 120_000
    u, i, y = _stream(rng, n, m, nnz)
    tc = build_tail_compact(u, i, y, n_users=n)
    a = jnp.asarray(rng.random((n, k)), jnp.float32) + 0.1
    b = jnp.asarray(rng.random((m, k)), jnp.float32) + 0.1
    ba = (jnp.asarray(rng.random((n,)), jnp.float32) + 0.05) if bias else None
    bb = (jnp.asarray(rng.random((m,)), jnp.float32) + 0.05) if bias else None

    ref = jax.jit(lambda: mxu_tail_sweep(a, b, ba, bb, tc, bf16=True))()
    got = jax.jit(lambda: pallas_tail_sweep(a, b, ba, bb, tc, bf16=True))()
    for r, g in zip(ref, got):
        if r is None:
            assert g is None
            continue
        r, g = np.asarray(r), np.asarray(g)
        denom = np.maximum(np.abs(r), 1e-3)
        assert np.max(np.abs(g - r) / denom) < 2e-2


def test_identity_primary_trailing_rows_zero_on_hardware():
    """The ADVICE r4 high finding reproduced on real HBM: output rows
    past the last window must be zero-filled, not left uninitialized."""
    from hgaprec_tpu.ops.mxu_tail import build_tail_compact
    from hgaprec_tpu.ops.pallas_tail import SPAN, pallas_tail_sweep

    rng = np.random.default_rng(61)
    n, m, k = 40_000, 2_000, 100
    n_present = 36_000                  # 0.9n; 4000-row gap > SPAN
    u = np.repeat(np.arange(n_present, dtype=np.int32), 3)  # all present
    i = rng.integers(0, m, u.size).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 4, u.size).astype(np.float32)
    tc = build_tail_compact(u, i, y, n_users=n)
    assert tc.w0_ur is not None
    assert n - n_present > SPAN
    a = jnp.asarray(rng.random((n, k)), jnp.float32) + 0.1
    b = jnp.asarray(rng.random((m, k)), jnp.float32) + 0.1
    acc_a, _, _, _ = jax.jit(
        lambda: pallas_tail_sweep(a, b, None, None, tc, bf16=True))()
    tail_rows = np.asarray(acc_a[n_present + SPAN:])
    np.testing.assert_array_equal(tail_rows, 0.0)
    assert np.isfinite(np.asarray(acc_a)).all()


def test_default_config_dispatches_pallas_tail(monkeypatch):
    """VERDICT r4 #3: a plain hybrid config (tail_impl='auto', any
    -precision) must execute the Pallas tail on TPU — asserted by a
    dispatch spy, not inferred from timing."""
    import numpy as np

    import hgaprec_tpu.ops.pallas_tail as pallas_mod
    from hgaprec_tpu.ops.mxu_tail import build_tail_compact
    from hgaprec_tpu.ops.sweep import sweep_hybrid
    from hgaprec_tpu.data.device import DeviceData

    rng = np.random.default_rng(5)
    n, m, k = 4_000, 1_500, 16
    u = np.repeat(np.arange(n, dtype=np.int32), 2)
    i = rng.integers(0, m, u.size).astype(np.int32)
    order = np.lexsort((i, u))
    u, i = u[order], i[order]
    y = rng.integers(1, 4, u.size).astype(np.float32)
    head_t = 128
    head_ids = jnp.arange(head_t, dtype=jnp.int32)
    head_dense = jnp.zeros((4096, head_t), jnp.uint8)
    tc = build_tail_compact(u, i, y, n_users=n)
    data = DeviceData(
        u_ids=jnp.asarray(u), i_ids=jnp.asarray(i), y=jnp.asarray(y),
        item_order=jnp.asarray(u), i_ids_sorted=jnp.asarray(i),
        u_ids_by_item=jnp.asarray(u), dense_y=None,
        head_items=head_ids, head_dense_y=head_dense,
        tail_compact=tc)
    called = []
    real = pallas_mod.pallas_tail_sweep

    def spy(*a, **kw):
        called.append("pallas")
        return real(*a, **kw)

    monkeypatch.setattr(pallas_mod, "pallas_tail_sweep", spy)
    elog_a = jnp.log(jnp.asarray(rng.random((n, k)) + 0.2, jnp.float32))
    elog_b = jnp.log(jnp.asarray(rng.random((m, k)) + 0.2, jnp.float32))
    # f32 "highest" precision — the parity-leaning default — still
    # routes the tail through the Pallas kernel (bf16 tables)
    res = sweep_hybrid(elog_a, elog_b, None, None, data,
                       bf16=False, tail_impl="auto")
    assert called == ["pallas"]
    assert np.isfinite(np.asarray(res.acc_a)).all()


def test_sharded_hybrid_uses_pallas_on_mesh(monkeypatch):
    """The sharded big-sparse layout on a real TPU mesh executes the
    Pallas tail inside shard_map (the pod production path; CPU tests
    necessarily exercise the mxu fallback there)."""
    import numpy as np

    import hgaprec_tpu.ops.pallas_tail as pallas_mod
    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.ratings import RatingsStore
    from hgaprec_tpu.models.step import _resolve_mode
    from hgaprec_tpu.parallel.sharded import build_sharded_run, make_mesh

    rng = np.random.default_rng(71)
    n, m, nnz = 4_000, 1_200, 40_000
    u = np.sort(rng.integers(0, n, nnz))
    i = rng.integers(0, m, nnz)
    key = u.astype(np.int64) * m + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    store = RatingsStore(n, m)
    store.add_training(u + 1, i + 1, np.ones(u.size))
    store.finalize()
    cfg = ModelConfig(n=store.n, m=store.m, k=16, variant="hpf",
                      sweep="hybrid", hybrid_head_items=128,
                      dense_limit_bytes=64)
    called = []
    real = pallas_mod.pallas_tail_sweep

    def spy(*a, **kw):
        called.append("pallas")
        return real(*a, **kw)

    monkeypatch.setattr(pallas_mod, "pallas_tail_sweep", spy)
    mesh = make_mesh(jax.devices())
    run = build_sharded_run(store, cfg, mesh, seed=2, pad_multiple=1024)
    assert _resolve_mode(run.cfg, run.data) == "hybrid"
    assert run.data.tail_compact.w0_u is not None
    out = run.step()
    jax.block_until_ready(jax.tree.leaves(out))
    assert called  # traced through the Pallas kernel under shard_map
    st = run.unsharded_state("eval")
    assert np.isfinite(np.asarray(st.theta.e)).all()
