"""Parallel scan primitives for HMM chain marginalization.

TPU-native replacement for the reference's funsor machinery: the Blelchley
up/down-sweep in tapqir/infer/sum_product.py:273-359 and the hand-rolled
``_sequential_logmatmulexp`` (tapqir/models/hmm.py:480-529) both become a
single ``jax.lax.associative_scan`` over log-transition matrices - O(log F)
depth on device.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["logmatmulexp", "cumulative_logmatmulexp"]


def logmatmulexp(a, b):
    """(..., i, j) @ (..., j, k) in log space, numerically stable."""
    return logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def cumulative_logmatmulexp(log_mats, axis):
    """All prefix products A_0, A_0@A_1, ..., A_0@...@A_{F-1} in log space.

    Equivalent to the reference's ``_sequential_logmatmulexp``
    (tapqir/models/hmm.py:480-529) but expressed as an associative scan,
    which XLA parallelizes across the time dimension.
    """
    return jax.lax.associative_scan(logmatmulexp, log_mats, axis=axis)
