"""Fused dense Pallas sweep == XLA dense sweep (interpreter mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import make_synthetic
from hgaprec_tpu.data.device import build_device_data
from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep, pallas_dense_ok
from hgaprec_tpu.ops.sweep import sweep_dense


@pytest.mark.parametrize("n,m,k,pad", [(40, 30, 3, 16), (70, 33, 5, 16),
                                       (40, 30, 3, 64)])  # Y wider than M
def test_fused_matches_xla_dense(rng, n, m, k, pad):
    store, _, _ = make_synthetic(rng, n=n, m=m, density=0.3)
    data = build_device_data(store, pad_multiple=pad)
    elog_a = rng.normal(size=(store.n, k)).astype(np.float32) * 0.3
    elog_b = rng.normal(size=(store.m, k)).astype(np.float32) * 0.3
    ja, jb = jnp.asarray(elog_a), jnp.asarray(elog_b)

    ref = sweep_dense(ja, jb, None, None, data.dense_y,
                      item_block=16, user_block=16)
    raw_a, raw_b = fused_dense_sweep(jnp.exp(ja), jnp.exp(jb), data.dense_y,
                                     tile_u=8, tile_c=16, interpret=True)
    acc_a = np.asarray(jnp.exp(ja) * raw_a)
    acc_b = np.asarray(jnp.exp(jb) * raw_b)
    np.testing.assert_allclose(acc_a, np.asarray(ref.acc_a),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(acc_b, np.asarray(ref.acc_b),
                               rtol=2e-4, atol=1e-5)


def test_vmem_gate():
    assert pallas_dense_ok(17770, 100)       # netflix fits
    assert not pallas_dense_ok(107523, 100)  # nyt uses the segment path


@pytest.mark.parametrize("variant", ["bpf", "hpf"])
def test_step_parity_dense_pallas(rng, variant):
    """cavi_step with the fused kernel == cavi_step with the XLA path."""
    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import cavi_step

    store, _, _ = make_synthetic(rng, n=24, m=18, density=0.35)
    data = build_device_data(store, pad_multiple=16)
    base = dict(n=store.n, m=store.m, k=3, variant=variant)
    s_x = init_state(ModelConfig(**base, sweep="dense"), seed=7)
    s_p = init_state(ModelConfig(**base, sweep="dense-pallas"), seed=7)
    for _ in range(3):
        s_x = cavi_step(s_x, data, ModelConfig(**base, sweep="dense"))
        s_p = cavi_step(s_p, data,
                        ModelConfig(**base, sweep="dense-pallas"))
    np.testing.assert_allclose(np.asarray(s_p.theta.e),
                               np.asarray(s_x.theta.e), rtol=5e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p.beta.e),
                               np.asarray(s_x.beta.e), rtol=5e-4,
                               atol=1e-6)


def test_fused_bias_matches_xla_dense(rng):
    """Pallas kernel with bias slots == XLA dense sweep with bias."""
    store, _, _ = make_synthetic(rng, n=45, m=29, density=0.3)
    data = build_device_data(store, pad_multiple=16)
    k = 4
    elog_a = rng.normal(size=(store.n, k)).astype(np.float32) * 0.3
    elog_b = rng.normal(size=(store.m, k)).astype(np.float32) * 0.3
    elog_ba = rng.normal(size=(store.n,)).astype(np.float32) * 0.3
    elog_bb = rng.normal(size=(store.m,)).astype(np.float32) * 0.3
    ja, jb = jnp.asarray(elog_a), jnp.asarray(elog_b)
    jba, jbb = jnp.asarray(elog_ba), jnp.asarray(elog_bb)

    ref = sweep_dense(ja, jb, jba, jbb, data.dense_y,
                      item_block=16, user_block=16)
    raw = fused_dense_sweep(jnp.exp(ja), jnp.exp(jb), data.dense_y,
                            jnp.exp(jba), jnp.exp(jbb),
                            tile_u=8, tile_c=16, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.exp(ja) * raw[0]),
                               np.asarray(ref.acc_a), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.exp(jb) * raw[1]),
                               np.asarray(ref.acc_b), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.exp(jba) * raw[2]),
                               np.asarray(ref.acc_bias_a), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.exp(jbb) * raw[3]),
                               np.asarray(ref.acc_bias_b), rtol=2e-4,
                               atol=1e-5)


def test_fused_bias_bf16_close_to_f32(rng):
    """Bias variant, bf16 vs f32 (ADVICE r4: in bf16 mode the bias
    expectations enter the score through the matmul and the bias
    statistics rowsum/colsum(w) are reduced in bf16 — pin the accepted
    error bound for the serving config)."""
    store, _, _ = make_synthetic(rng, n=45, m=29, density=0.3)
    data = build_device_data(store, pad_multiple=16)
    k = 4
    args = [jnp.exp(jnp.asarray(
        rng.normal(size=s).astype(np.float32) * 0.3))
        for s in ((store.n, k), (store.m, k), (store.n,), (store.m,))]
    f32 = fused_dense_sweep(*args[:2], data.dense_y, *args[2:],
                            tile_u=8, tile_c=16, interpret=True)
    bf = fused_dense_sweep(*args[:2], data.dense_y, *args[2:],
                           bf16=True, tile_u=8, tile_c=16, interpret=True)
    for r, g in zip(f32, bf):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.maximum(np.abs(r), 1e-3)
        assert np.max(np.abs(g - r) / denom) < 2e-2


def test_row_padded_y(rng):
    """dense_y rows padded past N at build time (odd-N fix): both the
    Pallas kernel and the XLA dense path must slice back to N."""
    store, _, _ = make_synthetic(rng, n=37, m=22, density=0.3)  # odd N
    data = build_device_data(store, pad_multiple=16)
    k = 3
    elog_a = rng.normal(size=(store.n, k)).astype(np.float32) * 0.3
    elog_b = rng.normal(size=(store.m, k)).astype(np.float32) * 0.3
    ja, jb = jnp.asarray(elog_a), jnp.asarray(elog_b)
    y_padded = jnp.pad(data.dense_y, ((0, 11), (0, 0)))  # rows > N

    ref = sweep_dense(ja, jb, None, None, data.dense_y,
                      item_block=16, user_block=16)
    got = sweep_dense(ja, jb, None, None, y_padded,
                      item_block=16, user_block=16)
    np.testing.assert_allclose(np.asarray(got.acc_a), np.asarray(ref.acc_a),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.acc_b), np.asarray(ref.acc_b),
                               rtol=2e-4, atol=1e-5)
    raw_a, raw_b = fused_dense_sweep(jnp.exp(ja), jnp.exp(jb), y_padded,
                                     tile_u=8, tile_c=16, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.exp(ja) * raw_a),
                               np.asarray(ref.acc_a), rtol=2e-4, atol=1e-5)


def test_odd_n_tiling_not_degenerate():
    """Netflix's odd N (480,189): build-time row padding must give the
    XLA dense path a real tile height, not 1-row tiles."""
    from hgaprec_tpu.ops.sweep import _user_block_of
    assert _user_block_of(480189, 16384) == 1          # the raw landmine
    n_store = -(-480189 // 512) * 512                  # build-time padding
    assert _user_block_of(n_store, 16384) >= 512       # fixed
