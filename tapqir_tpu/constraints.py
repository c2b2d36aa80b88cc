"""Constraint transforms between unconstrained optimizer space and parameter space.

Variational parameters are optimized by Adam in unconstrained space, exactly
like pyro.param's ``transform_to`` machinery (reference: pyro params with
``constraint=`` in tapqir/models/cosmos.py:464-598). The transform choices
mirror torch's ``transform_to`` registry so that optimization dynamics match:

* positive          -> exp
* unit_interval     -> sigmoid
* interval(a, b)    -> a + (b - a) * sigmoid
* greater_than(c)   -> c + exp
* simplex           -> softmax over the last axis

Each transform is a (forward, inverse) pair of pure jnp functions.
"""

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
from jax.nn import sigmoid, softmax


def _logit(p):
    return jnp.log(p) - jnp.log1p(-p)


@dataclass(frozen=True)
class Transform:
    """Bijective map unconstrained -> constrained (and back for init)."""

    forward: Callable
    inverse: Callable
    name: str = ""

    def __call__(self, u):
        return self.forward(u)


# Saturation bound for exp-based transforms. Sites whose gradient is
# near-zero for thousands of steps (e.g. h_beta on frames whose spot
# probability has converged to ~0) still take full-size Adam steps
# (mu/sqrt(nu) ~ +-1 regardless of gradient magnitude), so the
# unconstrained value random-walks; once it crosses ~88.7, float32
# exp(u) is inf, the next ELBO is NaN and the fit rolls back to the
# last checkpoint (observed every 2-5k iters late in the eLife-scale
# run, docs/elife_scale_run.md). Clamping the exponent at +-30
# (constrained value in [9.4e-14, 1.1e13], far outside any physical
# parameter range) zeroes the gradient at the rail, which drains the
# Adam momentum and stops the walk instead of rolling back.
_EXP_CLAMP = 30.0


def _bounded_exp(u):
    return jnp.exp(jnp.clip(u, -_EXP_CLAMP, _EXP_CLAMP))


def positive() -> Transform:
    return Transform(_bounded_exp, jnp.log, "positive")


# Saturation floor for sigmoid-based transforms. In float32, sigmoid(u)
# rounds to exactly 1.0 once u > ~16.6, after which log1p(-p) and
# Beta/Bernoulli log-probs at the boundary are -inf and 0 * -inf = NaN
# poisons the ELBO (observed after ~25k SVI iters as a converged m_probs
# entry drifts along the sigmoid asymptote). Clamping keeps every
# constrained value strictly inside its interval; at the clamp the sigmoid
# gradient is ~6e-8, i.e. already numerically zero.
_SIGMOID_EPS = 1e-6


def _bounded_sigmoid(u):
    return jnp.clip(sigmoid(u), _SIGMOID_EPS, 1.0 - _SIGMOID_EPS)


def unit_interval() -> Transform:
    return Transform(_bounded_sigmoid, _logit, "unit_interval")


def interval(low: float, high: float) -> Transform:
    width = high - low

    def fwd(u):
        return low + width * _bounded_sigmoid(u)

    def inv(x):
        return _logit((x - low) / width)

    return Transform(fwd, inv, f"interval({low},{high})")


def greater_than(lb: float) -> Transform:
    def fwd(u):
        return lb + _bounded_exp(u)

    def inv(x):
        return jnp.log(x - lb)

    return Transform(fwd, inv, f"greater_than({lb})")


def simplex() -> Transform:
    def fwd(u):
        return softmax(u, axis=-1)

    def inv(x):
        # matches torch SoftmaxTransform inverse (log of normalized probs)
        return jnp.log(x / x.sum(-1, keepdims=True))

    return Transform(fwd, inv, "simplex")


def identity() -> Transform:
    return Transform(lambda u: u, lambda x: x, "identity")
