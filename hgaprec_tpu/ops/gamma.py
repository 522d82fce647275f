"""Gamma-posterior primitives as pure functions on arrays.

TPU-native replacement for the reference's GPMatrix/GPMatrixGR/GPArray
buffer machinery (/root/reference/src/gpbase.hh): a variational Gamma family
is just `(shape, rate)` arrays; expectations and ELBO terms are elementwise
maps (digamma via XLA, lgamma via XLA) instead of GSL calls
(gsl_sf_psi / gsl_sf_lngamma, gpbase.hh:248-262, 360-387).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Reference clamp: make_nonzero floors non-positive params at 1e-30
# (gpbase.hh:27-44).
_FLOOR = 1e-30


def make_nonzero(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0.0, x, jnp.asarray(_FLOOR, x.dtype))


def expectations(shape: jax.Array, rate: jax.Array):
    """E[v] = a/b, Elog[v] = digamma(a) - log b  (gpbase.hh:248-262).

    `rate` broadcasts against `shape` (global per-factor rates are a [K]
    vector against an [N, K] shape, gpbase.hh:583-597).
    """
    a = make_nonzero(shape)
    b = make_nonzero(rate)
    e = a / b
    elog = jax.scipy.special.digamma(a) - jnp.log(b)
    return e, jnp.broadcast_to(elog, e.shape)


def elbo_term(shape: jax.Array, rate: jax.Array, e: jax.Array,
              elog: jax.Array, sprior: float, rprior,
              log_rprior=None) -> jax.Array:
    """Per-family ELBO contribution (gpbase.hh:360-387, 717-741, 951-969).

    Gamma prior cross-entropy minus variational entropy:
      sum[ a0*log(b0) + (a0-1)*Elog - b0*E - lgamma(a0) ]
    - sum[ a*log(b)  + (a-1)*Elog  - b*E  - lgamma(a)  ]

    `rprior` may be an array (hierarchical per-row prior rate E[xi_n],
    gpbase.hh:360-373) in which case `log_rprior` is Elog[xi_n]; both
    broadcast against `e` like set_prior_rate's row injection.
    """
    a = make_nonzero(shape)
    b = make_nonzero(jnp.broadcast_to(rate, a.shape))
    sprior = jnp.asarray(sprior, e.dtype)
    rprior = jnp.asarray(rprior, e.dtype)
    if log_rprior is None:
        log_rprior = jnp.log(rprior)
    log_rprior = jnp.asarray(log_rprior, e.dtype)
    if rprior.ndim and rprior.ndim < e.ndim:
        rprior = rprior[:, None]
        log_rprior = log_rprior[:, None]
    s = jnp.sum(sprior * log_rprior + (sprior - 1.0) * elog
                - rprior * e - jax.lax.lgamma(sprior))
    s -= jnp.sum(a * jnp.log(b) + (a - 1.0) * elog
                 - b * e - jax.lax.lgamma(a))
    return s


# ---------------------------------------------------------------------------
# Initialization. The reference jitters with GSL uniforms
# (gpbase.hh:292-340, 655-715, 851-880); we reproduce the same
# distributions with a host-side NumPy Generator so runs are seedable and
# device-independent (distributional, not bitwise, parity).
# ---------------------------------------------------------------------------

def init_matrix_gr(rng: np.random.Generator, n: int, k: int, sprior: float,
                   rprior: float, dtype=jnp.float32):
    """GPMatrixGR::initialize + initialize_exp (gpbase.hh:631-715).

    shape[i,k] = a + 0.01*U;  rate[k] = b + 0.1*U (global per factor).
    Initial expectations use *fresh per-row* random rates b_row[i,k] =
    b + 0.1*U unrelated to `rate` — an intentional reference quirk that
    decorrelates the first sweep.
    """
    shape = sprior + 0.01 * rng.random((n, k))
    rate = rprior + 0.1 * rng.random(k)
    b_init = rprior + 0.1 * rng.random((n, k))
    e = shape / b_init
    elog = _digamma_np(shape) - np.log(b_init)
    return (jnp.asarray(shape, dtype), jnp.asarray(rate, dtype),
            jnp.asarray(e, dtype), jnp.asarray(elog, dtype))


def init_matrix(rng: np.random.Generator, n: int, k: int, sprior: float,
                rprior: float, dtype=jnp.float32):
    """GPMatrix::initialize + initialize_exp (gpbase.hh:292-340).

    Per-entry rates; initialize() gives every row the *same* random rate
    row (gpbase.hh:299-305) but that buffer is immediately overwritten by
    set_to_prior, so only the initialize_exp() expectations matter — those
    use fresh per-row random rates.
    """
    shape = sprior + 0.01 * rng.random((n, k))
    rate = np.broadcast_to(rprior + 0.1 * rng.random(k), (n, k)).copy()
    b_init = rprior + 0.1 * rng.random((n, k))
    e = shape / b_init
    elog = _digamma_np(shape) - np.log(b_init)
    return (jnp.asarray(shape, dtype), jnp.asarray(rate, dtype),
            jnp.asarray(e, dtype), jnp.asarray(elog, dtype))


def init_array2(rng: np.random.Generator, n: int, sprior: float,
                rprior: float, v: float, dtype=jnp.float32):
    """GPArray::initialize2(v) + compute_expectations (gpbase.hh:909-918).

    shape[i] = a + 0.01*U;  rate[i] = b + v (deterministic). Used for the
    HPF activity/popularity scales with v = K (hgaprec.cc:173-178).
    """
    shape = sprior + 0.01 * rng.random(n)
    rate = np.full(n, rprior + v)
    e = shape / rate
    elog = _digamma_np(shape) - np.log(rate)
    return (jnp.asarray(shape, dtype), jnp.asarray(rate, dtype),
            jnp.asarray(e, dtype), jnp.asarray(elog, dtype))


def init_matrix2(rng: np.random.Generator, n: int, k: int, sprior: float,
                 rprior: float, v: float, dtype=jnp.float32):
    """GPMatrix::initialize2(v) + compute_expectations (gpbase.hh:310-322).

    Used for the bias terms: thetabias.initialize2(M),
    betabias.initialize2(N) (hgaprec.cc:196-202).
    """
    shape = sprior + 0.01 * rng.random((n, k))
    rate = np.full((n, k), rprior + v)
    e = shape / rate
    elog = _digamma_np(shape) - np.log(rate)
    return (jnp.asarray(shape, dtype), jnp.asarray(rate, dtype),
            jnp.asarray(e, dtype), jnp.asarray(elog, dtype))


def _digamma_np(x):
    # SciPy-free host digamma via the asymptotic series with recurrence;
    # accurate to ~1e-12 for x > 0 at the shapes we initialize (x ~ 0.3).
    x = np.asarray(x, np.float64)
    res = np.zeros_like(x)
    y = x.copy()
    # recurrence psi(x) = psi(x+1) - 1/x until y >= 6
    for _ in range(8):
        small = y < 6.0
        res = np.where(small, res - 1.0 / np.where(small, y, 1.0), res)
        y = np.where(small, y + 1.0, y)
    inv = 1.0 / y
    inv2 = inv * inv
    res += (np.log(y) - 0.5 * inv
            - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252)))
    return res
