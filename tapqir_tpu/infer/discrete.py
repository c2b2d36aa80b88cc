"""Closed-form discrete marginalization helpers.

The reference marginalizes the discrete latents z (state), theta
(target-specific spot index), and m (per-spot presence) by Pyro's
TraceEnum_ELBO enumeration (tapqir/models/cosmos.py:242-265,417-425).
The joint discrete space is tiny and known statically:
(1+S) * (1+K) * 2^K configurations (12 for the defaults S=1, K=2), so a
TPU-native design enumerates it with dense tables and logsumexp - fully
inside jit, no effect handlers.
"""

import jax.numpy as jnp
import numpy as np

from tapqir_tpu.distributions.util import expand_offtarget, probs_m

# Large-but-finite stand-in for log(0): keeps every gradient finite
# (exp(NEG_INF - max) == 0 in both f32 and f64).
NEG_INF = -1e30


def safe_log(p, floor=1e-30):
    """log with a floor; for probabilities that may be exactly zero."""
    return jnp.log(jnp.clip(p, floor, None))


def m_configs(K: int) -> np.ndarray:
    """All 2^K spot-presence configurations as a static (2^K, K) 0/1 table."""
    M = 1 << K
    return np.array([[(m >> k) & 1 for k in range(K)] for m in range(M)], np.float64)


def log_probs_theta(K: int, S: int, dtype=jnp.float32):
    """log p(theta | z) as a dense (1+S, 1+K) table; invalid combos -> NEG_INF.

    Rows for z > 0 all use the spot-present distribution (the reference clamps
    z to [0, 1] before indexing, cosmos.py:250-253).
    """
    tab = np.zeros((2, 1 + K))  # pure numpy: stays a compile-time constant
    tab[0, 0] = 1.0
    tab[1, 1:] = 1.0 / K
    rows = [tab[0]] + [tab[1]] * S
    tab_full = np.stack(rows)  # (1+S, 1+K)
    out = np.where(tab_full > 0, np.log(np.maximum(tab_full, 1e-300)), NEG_INF)
    return jnp.asarray(out, dtype)


def log_probs_z(pi, is_ontarget):
    """log p(z | pi, is_ontarget) of shape (n, Q, 1+S).

    Off-target AOIs are forced into z=0 (expand_offtarget semantics,
    reference: cosmos.py:175,244).

    :param pi: (Q, 1+S) state probabilities (traced).
    :param is_ontarget: (n,) int {0,1}.
    """
    pi_ext = expand_offtarget(pi)  # (Q, 1+S, 2)
    lpz = safe_log(pi_ext)  # constants exactly 0 -> ~-69, no NaN grads
    sel = lpz[:, :, is_ontarget]  # (Q, 1+S, n)
    return jnp.moveaxis(sel, -1, 0)  # (n, Q, 1+S)


def log_probs_m(lamda, K: int):
    """(log p(m_k=1 | theta), log p(m_k=0 | theta)) tables, each (..., 1+K, K).

    The deterministic entries (theta == k+1 -> m_k = 1 surely) are handled
    with a static mask so gradients wrt lamda stay finite.
    """
    pm = probs_m(lamda, K)  # (..., 1+K, K)
    eye = np.zeros((1 + K, K), bool)
    eye[1:, :] = np.eye(K, dtype=bool)
    eye = jnp.asarray(eye)
    pm_safe = jnp.where(eye, 0.5, jnp.clip(pm, 1e-30, 1.0 - 1e-7))
    log1 = jnp.where(eye, 0.0, jnp.log(pm_safe))
    log0 = jnp.where(eye, NEG_INF, jnp.log1p(-pm_safe))
    return log1, log0
