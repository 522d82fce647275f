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
