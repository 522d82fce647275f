"""One CAVI iteration per model variant, as a pure jitted function.

Update *ordering* within an iteration is part of the algorithm and is kept
exactly as the reference stages it:

  * vb() (hgaprec.cc:919-980): theta rate uses old beta; theta swaps; beta
    rate uses the *new* theta (asymmetric staleness).
  * vb_bias() (1219-1319): same, plus bias shape slots; -novb switches to
    fully synchronous swaps (all rates from old expectations).
  * vb_hier() (1321-1436): per-row prior rates injected from the scale
    variables (set_prior_rate, gpbase.hh:163-173); scales update last from
    the *new* factor expectations.
  * vb_mle_user/item (982-1130) and vb_canny (1132-1216): one side is a
    point matrix renormalized per sweep (EM for GaP / Canny's GaP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from hgaprec_tpu import config as C
from hgaprec_tpu.config import ModelConfig
from hgaprec_tpu.data.device import DeviceData
from hgaprec_tpu.models.state import Gam, ModelState
from hgaprec_tpu.ops.gamma import expectations
from hgaprec_tpu.ops.sweep import sweep


def _gam(shape, rate) -> Gam:
    e, elog = expectations(shape, rate)
    return Gam(shape=shape, rate=rate, e=e, elog=elog)


def _bias_updates(cfg: ModelConfig, state: ModelState, res):
    """Bias Gamma(0.3, 0.3) updates: shape += y*phi[bias slot], rate =
    prior + count of opposite-side entities (update_rate_next_all,
    hgaprec.cc:1265-1270, gpbase.hh:231-237)."""
    tb = _gam(0.3 + res.acc_bias_a,
              jnp.full_like(state.theta_bias.rate, 0.3 + cfg.m))
    bb = _gam(0.3 + res.acc_bias_b,
              jnp.full_like(state.beta_bias.rate, 0.3 + cfg.n))
    return tb, bb


def _resolve_mode(cfg: ModelConfig, data: DeviceData) -> str:
    mode = cfg.resolve_sweep()
    if mode == C.SWEEP_DENSE and data.dense_y is None:
        mode = C.SWEEP_SEGMENT
    return mode


def cavi_step(state: ModelState, data: DeviceData,
              cfg: ModelConfig) -> ModelState:
    mode = _resolve_mode(cfg, data)
    if cfg.variant == C.VARIANT_BPF:
        return _step_bpf(state, data, cfg, mode)
    if cfg.variant == C.VARIANT_HPF:
        return _step_hpf(state, data, cfg, mode)
    if cfg.variant == C.VARIANT_MLE_USER:
        return _step_mle_user(state, data, cfg, mode)
    if cfg.variant == C.VARIANT_MLE_ITEM:
        return _step_mle_item(state, data, cfg, mode, canny=False)
    if cfg.variant == C.VARIANT_CANNY:
        return _step_mle_item(state, data, cfg, mode, canny=True)
    raise ValueError(cfg.variant)


def _step_bpf(state, data, cfg, mode):
    eb_u = state.theta_bias.elog if cfg.bias else None
    eb_i = state.beta_bias.elog if cfg.bias else None
    res = sweep(state.theta.elog, state.beta.elog, eb_u, eb_i, data, mode,
                cfg.item_block, cfg.matmul_precision)

    betasum = jnp.sum(state.beta.e, axis=0)                  # old beta [K]
    theta = _gam(cfg.a + res.acc_a, cfg.b + betasum)
    if cfg.vb:
        thetasum = jnp.sum(theta.e, axis=0)                  # NEW theta [K]
    else:
        thetasum = jnp.sum(state.theta.e, axis=0)            # -novb: old
    beta = _gam(cfg.c + res.acc_b, cfg.d + thetasum)

    tb, bb = (None, None)
    if cfg.bias:
        tb, bb = _bias_updates(cfg, state, res)
    return ModelState(theta=theta, beta=beta, theta_rate=None,
                      beta_rate=None, theta_bias=tb, beta_bias=bb,
                      theta_mle=None, beta_mle=None, theta_prior_e=None,
                      theta_prior_elog=None, beta_prior_e=None,
                      beta_prior_elog=None)


def _step_hpf(state, data, cfg, mode):
    eb_u = state.theta_bias.elog if cfg.bias else None
    eb_i = state.beta_bias.elog if cfg.bias else None
    res = sweep(state.theta.elog, state.beta.elog, eb_u, eb_i, data, mode,
                cfg.item_block, cfg.matmul_precision)

    # theta: prior rate := E[xi] per row (replacing b), plus old-beta colsum
    betarowsum = jnp.sum(state.beta.e, axis=0)               # [K]
    xi = state.theta_rate
    theta = _gam(cfg.a + res.acc_a,
                 xi.e[:, None] + betarowsum[None, :])
    # beta: symmetric with the NEW theta (hgaprec.cc:1380-1386)
    thetarowsum = jnp.sum(theta.e, axis=0)
    eta = state.beta_rate
    beta = _gam(cfg.c + res.acc_b,
                eta.e[:, None] + thetarowsum[None, :])

    tb, bb = (None, None)
    if cfg.bias:
        tb, bb = _bias_updates(cfg, state, res)

    # scales last, from NEW factor expectations (hgaprec.cc:1398-1414):
    # shape = prior + K*prior; rate = prior + row-sums of E.
    theta_rate = _gam(
        jnp.full_like(xi.shape, cfg.ap + cfg.k * cfg.ap),
        cfg.bp + jnp.sum(theta.e, axis=1))
    beta_rate = _gam(
        jnp.full_like(eta.shape, cfg.cp + cfg.k * cfg.cp),
        cfg.dp + jnp.sum(beta.e, axis=1))

    return ModelState(theta=theta, beta=beta, theta_rate=theta_rate,
                      beta_rate=beta_rate, theta_bias=tb, beta_bias=bb,
                      theta_mle=None, beta_mle=None,
                      # prior rates in effect for the updated theta/beta
                      theta_prior_e=xi.e, theta_prior_elog=xi.elog,
                      beta_prior_e=eta.e, beta_prior_elog=eta.elog)


def _step_mle_user(state, data, cfg, mode):
    log_td_old = jnp.log(state.theta_mle)
    res = sweep(log_td_old, state.beta.elog, None, None, data, mode,
                cfg.item_block, cfg.matmul_precision)
    betasum = jnp.sum(state.beta.e, axis=0)                  # old beta [K]
    td = res.acc_a / betasum[None, :]                        # EM normalize
    thetasum = jnp.sum(td, axis=0)
    beta = _gam(cfg.c + res.acc_b, cfg.d + thetasum)
    return ModelState(theta=state.theta, beta=beta, theta_rate=None,
                      beta_rate=None, theta_bias=None, beta_bias=None,
                      theta_mle=td, beta_mle=None, theta_prior_e=None,
                      theta_prior_elog=None, beta_prior_e=None,
                      beta_prior_elog=None)


def _step_mle_item(state, data, cfg, mode, canny: bool):
    log_bd_old = jnp.log(state.beta_mle)
    res = sweep(state.theta.elog, log_bd_old, None, None, data, mode,
                cfg.item_block, cfg.matmul_precision)
    thetasum = jnp.sum(state.theta.e, axis=0)                # old theta [K]
    if canny:
        # floor *before* normalizing (hgaprec.cc:1173-1176), then per-factor
        # L1 column normalization (1179-1187)
        bd = jnp.maximum(res.acc_b, 1e-10) / thetasum[None, :]
        bd = bd / jnp.sum(bd, axis=0, keepdims=True)
    else:
        bd = res.acc_b / thetasum[None, :]
    betasum = jnp.sum(bd, axis=0)
    theta = _gam(cfg.a + res.acc_a, cfg.b + betasum)
    return ModelState(theta=theta, beta=state.beta, theta_rate=None,
                      beta_rate=None, theta_bias=None, beta_bias=None,
                      theta_mle=None, beta_mle=bd, theta_prior_e=None,
                      theta_prior_elog=None, beta_prior_e=None,
                      beta_prior_elog=None)


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _jitted_step(state, data, cfg):
    return cavi_step(state, data, cfg)


def make_step(cfg: ModelConfig):
    """Return a jitted `step(state, data) -> state` for this config."""
    def step(state: ModelState, data: DeviceData) -> ModelState:
        return _jitted_step(state, data, cfg)
    return step
