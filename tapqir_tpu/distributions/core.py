"""Core distribution primitives as pure jnp functions.

This is the TPU-native replacement for the reference's L0/L1 distribution
substrate (torch.distributions + pyro.distributions). Every sampler is
reparameterized (pathwise-differentiable): ``jax.random.gamma`` /
``jax.random.beta`` / ``jax.random.dirichlet`` implement implicit
reparameterization in XLA, matching torch's ``rsample`` semantics that the
reference's SVI relies on.

Parameterizations follow the reference exactly:

* Gamma(concentration, rate) - guide families use the (loc, beta) form
  concentration = loc * beta, rate = beta (tapqir/models/cosmos.py:342-358).
* AffineBeta(mean, sample_size, low, high) - Beta reparameterized by mean
  and sample size then affine-mapped (tapqir/distributions/affine_beta.py).
"""

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln, xlogy

# ---------------------------------------------------------------------------
# Gamma (concentration/rate)
# ---------------------------------------------------------------------------


def gamma_log_prob(x, concentration, rate):
    return (
        xlogy(concentration, rate)
        + xlogy(concentration - 1.0, x)
        - rate * x
        - gammaln(concentration)
    )


def gamma_sample(key, concentration, rate, shape=None):
    if shape is None:
        shape = jnp.broadcast_shapes(jnp.shape(concentration), jnp.shape(rate))
    g = jax.random.gamma(key, concentration, shape=shape)
    return g / rate


def gamma_mean(concentration, rate):
    return concentration / rate


def gamma_entropy(concentration, rate):
    return (
        concentration
        - jnp.log(rate)
        + gammaln(concentration)
        + (1.0 - concentration) * digamma(concentration)
    )


# ---------------------------------------------------------------------------
# HalfNormal(scale)
# ---------------------------------------------------------------------------

_HALF_LOG_2_OVER_PI = 0.5 * math.log(2.0 / math.pi)


def halfnormal_log_prob(x, scale):
    return _HALF_LOG_2_OVER_PI - jnp.log(scale) - 0.5 * (x / scale) ** 2


def halfnormal_sample(key, scale, shape=None):
    if shape is None:
        shape = jnp.shape(scale)
    return jnp.abs(jax.random.normal(key, shape)) * scale


# ---------------------------------------------------------------------------
# Exponential(rate)
# ---------------------------------------------------------------------------


def exponential_log_prob(x, rate):
    return jnp.log(rate) - rate * x


def exponential_sample(key, rate, shape=None):
    if shape is None:
        shape = jnp.shape(rate)
    return jax.random.exponential(key, shape) / rate


# ---------------------------------------------------------------------------
# Beta(concentration1, concentration0)
# ---------------------------------------------------------------------------


def beta_log_prob(x, c1, c0):
    return (
        xlogy(c1 - 1.0, x)
        + xlogy(c0 - 1.0, 1.0 - x)
        + gammaln(c1 + c0)
        - gammaln(c1)
        - gammaln(c0)
    )


def beta_sample(key, c1, c0, shape=None):
    if shape is None:
        shape = jnp.broadcast_shapes(jnp.shape(c1), jnp.shape(c0))
    return jax.random.beta(key, c1, c0, shape=shape)


# ---------------------------------------------------------------------------
# AffineBeta(mean, sample_size, low, high)
#   concentration1 = size * (mean - low) / (high - low)
#   concentration0 = size * (high - mean) / (high - low)
#   Y = low + (high - low) * Beta(c1, c0)
# (reference: tapqir/distributions/affine_beta.py:10-49)
# ---------------------------------------------------------------------------


def affine_beta_concentrations(mean, sample_size, low, high):
    width = high - low
    c1 = sample_size * (mean - low) / width
    c0 = sample_size * (high - mean) / width
    return c1, c0


def affine_beta_log_prob(x, mean, sample_size, low, high):
    c1, c0 = affine_beta_concentrations(mean, sample_size, low, high)
    width = high - low
    u = (x - low) / width
    return beta_log_prob(u, c1, c0) - jnp.log(width)


def affine_beta_sample(key, mean, sample_size, low, high, shape=None):
    c1, c0 = affine_beta_concentrations(mean, sample_size, low, high)
    u = beta_sample(key, c1, c0, shape=shape)
    # keep samples strictly inside the open interval for log_prob stability
    eps = jnp.finfo(u.dtype).eps
    u = jnp.clip(u, eps, 1.0 - eps)
    return low + (high - low) * u


def affine_beta_mean(mean, sample_size, low, high):
    del sample_size, low, high
    return mean


def affine_beta_sample_stacked(key, means, sizes, lows, highs):
    """Sample several AffineBeta sites with ONE batched gamma call.

    Each gamma rejection sampler compiles to its own while_loop with fixed
    per-call overhead; stacking the concentrations of all sites (and both
    Beta gammas) into a single ``jax.random.gamma`` amortizes it.

    :param means/sizes: lists of per-site parameter arrays (same shape).
    :param lows/highs: per-site scalars.
    :return: list of samples, one per site.
    """
    n_sites = len(means)
    c1s, c0s = [], []
    for mean, size, low, high in zip(means, sizes, lows, highs):
        c1, c0 = affine_beta_concentrations(mean, size, low, high)
        c1s.append(jnp.broadcast_to(c1, jnp.shape(size)))
        c0s.append(jnp.broadcast_to(c0, jnp.shape(size)))
    conc = jnp.stack(c1s + c0s)  # (2 * n_sites, ...)
    g = jax.random.gamma(key, conc)
    out = []
    for i, (low, high) in enumerate(zip(lows, highs)):
        u = g[i] / (g[i] + g[i + n_sites])
        eps = jnp.finfo(u.dtype).eps
        u = jnp.clip(u, eps, 1.0 - eps)
        out.append(low + (high - low) * u)
    return out


# ---------------------------------------------------------------------------
# Dirichlet(concentration)  [event along the last axis]
# ---------------------------------------------------------------------------


def dirichlet_log_prob(x, concentration):
    return (
        xlogy(concentration - 1.0, x).sum(-1)
        + gammaln(concentration.sum(-1))
        - gammaln(concentration).sum(-1)
    )


def dirichlet_sample(key, concentration, shape=None):
    if shape is None:
        shape = jnp.shape(concentration)[:-1]
    out = jax.random.dirichlet(key, concentration, shape=shape)
    eps = jnp.finfo(out.dtype).eps
    out = jnp.clip(out, eps, 1.0)
    return out / out.sum(-1, keepdims=True)


def dirichlet_mean(concentration):
    return concentration / concentration.sum(-1, keepdims=True)


# ---------------------------------------------------------------------------
# Bernoulli / Categorical helpers (enumeration only - never sampled in SVI)
# ---------------------------------------------------------------------------


def bernoulli_log_prob(value, probs):
    """log p(value) with value in {0, 1}; safe at probs in {0, 1}."""
    eps = jnp.finfo(jnp.result_type(float)).tiny
    return jnp.where(
        value > 0.5, jnp.log(jnp.maximum(probs, eps)), jnp.log1p(-jnp.minimum(probs, 1 - eps))
    )


def categorical_sample(key, probs, shape=None):
    logits = jnp.log(probs)
    if shape is None:
        shape = jnp.shape(probs)[:-1]
    return jax.random.categorical(key, logits, shape=shape)
