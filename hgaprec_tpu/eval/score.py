"""Prediction scores s(n, m) for every model variant.

Reference: prediction_score / prediction_score_hier (hgaprec.cc:1850-1991)
and rating_likelihood[_hier] (1503-1560). Score = E[theta]·E[beta]
(+ bias expectations), with the point-estimate matrices substituted for
the MLE/Canny variants. Raw rate is used as the ranking score
(_use_rate_as_score = true, hgaprec.cc:30).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hgaprec_tpu import config as C
from hgaprec_tpu.config import ModelConfig
from hgaprec_tpu.models.state import ModelState


def score_arrays(state: ModelState, cfg: ModelConfig):
    """Return (su [N,K], sv [M,K], bias_u [N]|None, bias_i [M]|None)."""
    if cfg.variant == C.VARIANT_MLE_USER:
        su, sv = state.theta_mle, state.beta.e
    elif cfg.variant in (C.VARIANT_MLE_ITEM, C.VARIANT_CANNY):
        su, sv = state.theta.e, state.beta_mle
    else:
        su, sv = state.theta.e, state.beta.e
    bu = state.theta_bias.e if cfg.bias else None
    bi = state.beta_bias.e if cfg.bias else None
    return su, sv, bu, bi


@functools.partial(jax.jit, static_argnums=())
def _scores_full(su, sv, bu, bi, users):
    s = jnp.dot(su[users], sv.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    if bu is not None:
        s = s + bu[users][:, None] + bi[None, :]
    return s


def user_scores(state: ModelState, cfg: ModelConfig,
                users: jax.Array) -> jax.Array:
    """[len(users), M] score matrix on device."""
    su, sv, bu, bi = score_arrays(state, cfg)
    return _scores_full(su, sv, bu, bi, users)


@functools.partial(jax.jit, static_argnums=(7,))
def _pair_loglik(su, sv, bu, bi, u, i, y, binary):
    s = jnp.sum(su[u] * sv[i], axis=1)
    if bu is not None:
        s = s + bu[u] + bi[i]
    s = jnp.maximum(s, 1e-30)           # reference floor (hgaprec.cc:1531)
    if binary:
        # y==0 ? -s : log(1 - exp(-s))   (hgaprec.cc:1533-1534)
        ll = jnp.where(y == 0, -s, jnp.log(-jnp.expm1(-s)))
    else:
        # y log s - s - log y!           (hgaprec.cc:1535, 1563-1570)
        ll = y * jnp.log(s) - s - jax.lax.lgamma(y + 1.0)
    return jnp.sum(ll), ll


def pair_loglik(state: ModelState, cfg: ModelConfig, u, i, y):
    """Total and per-pair heldout log-likelihood for (u, i, y) arrays."""
    su, sv, bu, bi = score_arrays(state, cfg)
    return _pair_loglik(su, sv, bu, bi, u, i, y, cfg.binary)


def pair_scores(state: ModelState, cfg: ModelConfig, u, i):
    su, sv, bu, bi = score_arrays(state, cfg)
    s = jnp.sum(su[u] * sv[i], axis=1)
    if bu is not None:
        s = s + bu[u] + bi[i]
    return s
