"""Sharded == single-device: CAVI over an 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from conftest import make_synthetic
from hgaprec_tpu.config import ModelConfig
from hgaprec_tpu.data.device import build_device_data
from hgaprec_tpu.models.state import init_state
from hgaprec_tpu.models.step import make_step
from hgaprec_tpu.parallel.sharded import build_sharded_run, make_mesh


@pytest.mark.parametrize("variant,kw,dense", [
    ("bpf", {}, True),
    ("bpf", {"bias": True}, False),
    ("hpf", {}, True),
    ("hpf", {}, False),
    ("mle_user", {}, True),
    ("canny", {}, False),
])
def test_sharded_matches_single(rng, variant, kw, dense):
    assert len(jax.devices()) == 8
    store, validation, test = make_synthetic(rng, n=53, m=31, density=0.3)
    cfg = ModelConfig(n=store.n, m=store.m, k=4, variant=variant,
                      sweep="dense" if dense else "segment", **kw)

    # single device
    data = build_device_data(store, pad_multiple=128)
    state = init_state(cfg, seed=11)
    step = make_step(cfg)
    for _ in range(3):
        state = step(state, data)

    # sharded over 8 devices
    run = build_sharded_run(store, cfg, make_mesh(), seed=11,
                            pad_multiple=128, dense=dense)
    for _ in range(3):
        run.step()
    got = run.unsharded_state()

    def close(a, b, name):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6, err_msg=name)

    if variant != "mle_user":
        close(got.theta.e, state.theta.e, "theta_e")
        close(got.theta.elog, state.theta.elog, "theta_elog")
    if variant not in ("mle_item", "canny"):
        close(got.beta.e, state.beta.e, "beta_e")
    if variant == "hpf":
        close(got.theta_rate.e, state.theta_rate.e, "xi")
        close(got.beta_rate.e, state.beta_rate.e, "eta")
    if cfg.bias:
        close(got.theta_bias.e, state.theta_bias.e, "tbias")
        close(got.beta_bias.e, state.beta_bias.e, "bbias")
    if variant == "mle_user":
        close(got.theta_mle, state.theta_mle, "theta_mle")
    if variant == "canny":
        close(got.beta_mle, state.beta_mle, "beta_mle")


def test_uneven_rows_masked(rng):
    """n not divisible by ndev: padded rows must not perturb results."""
    store, _, _ = make_synthetic(rng, n=41, m=23, density=0.3)
    cfg = ModelConfig(n=store.n, m=store.m, k=3, variant="hpf")
    data = build_device_data(store, pad_multiple=128)
    state = init_state(cfg, seed=5)
    step = make_step(cfg)
    for _ in range(2):
        state = step(state, data)
    run = build_sharded_run(store, cfg, make_mesh(), seed=5,
                            pad_multiple=128)
    for _ in range(2):
        run.step()
    got = run.unsharded_state()
    np.testing.assert_allclose(np.asarray(got.beta.e),
                               np.asarray(state.beta.e), rtol=2e-4,
                               atol=1e-6)
