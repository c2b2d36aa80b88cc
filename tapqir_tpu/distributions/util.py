"""Model-structure utility functions (pure jnp).

TPU-native re-derivations of the reference's distribution utilities
(reference: tapqir/distributions/util.py:15-173). All functions are pure,
static-shape, jit-friendly.
"""

import math

import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy


def gaussian_spots(height, width, x, y, target_locs, P, m=None):
    r"""Render K ideal 2D-Gaussian spots on a P x P pixel grid.

    mu^S[..., k, i, j] = m*h / (2 pi w^2)
        * exp(-((j - x - x_target)^2 + (i - y - y_target)^2) / (2 w^2))

    Pixel coordinate convention matches the reference's
    ``torch.meshgrid(..., indexing="xy")`` (tapqir/distributions/util.py:44-61):
    the *column* index is the x-coordinate and the *row* index is the
    y-coordinate.

    :param height: (..., K) integrated spot intensity.
    :param width: (..., K) spot width (Gaussian sigma).
    :param x: (..., K) spot center offset from target on x-axis.
    :param y: (..., K) spot center offset from target on y-axis.
    :param target_locs: (..., 2) target location, broadcastable against
        the (..., K) batch after an appended K axis.
    :param P: pixels along each axis (static).
    :param m: optional (..., K) spot presence indicator.
    :return: (..., K, P, P) rendered spots.
    """
    dtype = jnp.result_type(height, width, x, y)
    grid = jnp.arange(P, dtype=dtype)

    spot_x = x + target_locs[..., 0][..., None]  # (..., K)
    spot_y = y + target_locs[..., 1][..., None]  # (..., K)
    var = width.astype(dtype) ** 2

    dx2 = (grid - spot_x[..., None]) ** 2  # (..., K, P) over columns
    dy2 = (grid - spot_y[..., None]) ** 2  # (..., K, P) over rows
    log_norm = jnp.log(2.0 * math.pi * var)
    g = jnp.exp(
        -(dy2[..., :, None] + dx2[..., None, :]) / (2.0 * var[..., None, None])
        - log_norm[..., None, None]
    )  # (..., K, P, P)
    if m is not None:
        height = m * height
    return height[..., None, None] * g


def gaussian_spots_flat(height, width, x, y, target_locs, P, ev_pad, m=None):
    r"""Render K spots directly on a FLAT, lane-padded pixel axis.

    Same math and coordinate convention as :func:`gaussian_spots`, but the
    output's pixel axis is flat row-major (idx = i * P + j) and padded to
    ``ev_pad`` with zeros. Rendering straight into the padded flat layout
    keeps the whole likelihood pipeline lane-aligned on TPU - reshaping a
    (..., P, P) tensor to (..., P*P) with P*P not a multiple of 128 forces
    XLA to emit serial relayout loops around the Pallas kernel that cost
    several times the kernel itself (profiled at eLife scale).

    :return: (..., K, ev_pad) rendered spots; entries at idx >= P*P are 0.
    """
    dtype = jnp.result_type(height, width, x, y)
    idx = jnp.arange(ev_pad)
    grid_y = (idx // P).astype(dtype)  # row index = y coordinate
    grid_x = (idx % P).astype(dtype)  # column index = x coordinate
    valid = (idx < P * P).astype(dtype)

    spot_x = x + target_locs[..., 0][..., None]  # (..., K)
    spot_y = y + target_locs[..., 1][..., None]
    var = width.astype(dtype) ** 2
    d2 = (grid_x - spot_x[..., None]) ** 2 + (grid_y - spot_y[..., None]) ** 2
    g = jnp.exp(
        -d2 / (2.0 * var[..., None]) - jnp.log(2.0 * math.pi * var)[..., None]
    )
    if m is not None:
        height = m * height
    return height[..., None] * g * valid


def truncated_poisson_probs(lamda, K):
    r"""Probability of the number of non-specific spots.

    TruncatedPoisson(k; lambda, K) = lambda^k e^-lambda / k!  for k < K,
    and 1 - sum_{i<K} ... for k = K.
    (reference: tapqir/distributions/util.py:67-91)

    :param lamda: (...,) rate of target-nonspecific binding.
    :return: (..., K + 1) probabilities.
    """
    kdx = jnp.arange(K, dtype=lamda.dtype)
    lam = lamda[..., None]
    body = jnp.exp(xlogy(kdx, lam) - lam - gammaln(kdx + 1.0))  # (..., K)
    last = 1.0 - body.sum(-1, keepdims=True)
    return jnp.concatenate([body, last], axis=-1)


def probs_m(lamda, K):
    r"""Prior spot presence probability p(m_k = 1 | theta, lambda).

    = 1 if theta == k + 1;
    = sum_{l=1..K} l*TruncPoisson(l; lambda, K)/K if theta == 0;
    = sum_{l=1..K-1} l*TruncPoisson(l; lambda, K-1)/(K-1) otherwise.
    (reference: tapqir/distributions/util.py:94-130)

    :param lamda: (...,) rate.
    :return: (..., 1 + K, K) Bernoulli probabilities.
    """
    if K > 1:
        tp_km1 = truncated_poisson_probs(lamda, K - 1)  # (..., K)
        l_km1 = jnp.arange(1, K, dtype=lamda.dtype)
        base = (l_km1 * tp_km1[..., 1:K]).sum(-1) / (K - 1)  # (...,)
    else:
        base = jnp.zeros_like(lamda)
    tp_k = truncated_poisson_probs(lamda, K)  # (..., K+1)
    l_k = jnp.arange(1, K + 1, dtype=lamda.dtype)
    row0 = (l_k * tp_k[..., 1:]).sum(-1) / K  # (...,)

    out = jnp.broadcast_to(base[..., None, None], lamda.shape + (1 + K, K))
    out = jnp.concatenate(
        [jnp.broadcast_to(row0[..., None, None], lamda.shape + (1, K)), out[..., 1:, :]],
        axis=-2,
    )
    # theta == k + 1 -> m_k present with probability 1
    eye = jnp.eye(K, dtype=bool)
    eye_rows = jnp.concatenate([jnp.zeros((1, K), dtype=bool), eye], axis=0)
    return jnp.where(eye_rows, 1.0, out)


def expand_offtarget(probs):
    r"""Expand state probabilities to off-target AOIs.

    Off-target AOIs are forced into state 0 with probability one
    (reference: tapqir/distributions/util.py:133-151).

    :param probs: (..., 1 + S) on-target state probabilities.
    :return: (..., 1 + S, 2) probabilities indexed [..., state, is_ontarget].
    """
    offtarget = jnp.zeros_like(probs)
    offtarget = offtarget.at[..., 0].set(1.0)
    return jnp.stack([offtarget, probs], axis=-1)


def probs_theta(K, dtype=jnp.float32):
    r"""Prior probability table p(theta | z) of shape (2, 1 + K).

    z = 0 -> theta = 0; z > 0 -> theta uniform over {1..K}
    (reference: tapqir/distributions/util.py:154-173).
    """
    row0 = jnp.concatenate([jnp.ones((1,), dtype), jnp.zeros((K,), dtype)])
    row1 = jnp.concatenate([jnp.zeros((1,), dtype), jnp.full((K,), 1.0 / K, dtype)])
    return jnp.stack([row0, row1])
