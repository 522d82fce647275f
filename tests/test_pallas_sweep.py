"""Pallas sparse sweep vs segment path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from hgaprec_tpu.data.device import build_device_data
from hgaprec_tpu.ops.pallas_sweep import build_pallas_csr, sweep_pallas
from hgaprec_tpu.ops.sweep import sweep_segment


@pytest.mark.parametrize("n,m,k,nnz,rows,chunk", [
    (50, 40, 5, 400, 16, 64),
    (130, 70, 7, 1500, 32, 128),
    (33, 21, 3, 100, 8, 256),     # chunk > nnz of most tiles
])
def test_pallas_matches_segment(rng, n, m, k, nnz, rows, chunk):
    from hgaprec_tpu.data.ratings import RatingsStore
    store = RatingsStore(n, m)
    seen = set()
    while len(seen) < nnz:
        seen.add((int(rng.integers(0, n)), int(rng.integers(0, m))))
    u, i = np.array(sorted(seen)).T
    y = rng.integers(1, 6, size=u.size)
    store.add_training(u, i, y)
    store.finalize()

    elog_a = rng.normal(size=(store.n, k)).astype(np.float32) * 0.5 - 1.0
    elog_b = rng.normal(size=(store.m, k)).astype(np.float32) * 0.5 - 1.0

    data = build_device_data(store, pad_multiple=64)
    ref = sweep_segment(jnp.asarray(elog_a), jnp.asarray(elog_b), None,
                        None, data)

    csr = build_pallas_csr(store, rows=rows, chunk=chunk)
    with pltpu.force_tpu_interpret_mode():
        acc_a, acc_b = sweep_pallas(jnp.asarray(elog_a),
                                    jnp.asarray(elog_b), csr, rows=rows,
                                    chunk=chunk)
    np.testing.assert_allclose(np.asarray(acc_a), np.asarray(ref.acc_a),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_b), np.asarray(ref.acc_b),
                               rtol=2e-4, atol=1e-5)
