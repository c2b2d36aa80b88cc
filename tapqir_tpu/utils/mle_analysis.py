"""MLE models for kinetic analysis (reference: tapqir/utils/mle_analysis.py).

The reference runs tiny SVIs with empty guides (= MLE) through Pyro
(mle_analysis.py:11-34); here the same likelihoods are explicit jnp
functions optimized by a jit-compiled optax Adam loop. Discrete "active"
indicators are marginalized in closed form (logaddexp) instead of
TraceEnum_ELBO enumeration.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["train", "ttfb_model_loss", "ttfb_mle", "exp_model_loss", "exp_mle"]


def train(loss_fn: Callable, params0: Dict, lr=1e-3, n_steps=1000) -> Dict:
    """Adam MLE loop (reference: mle_analysis.py:11-34). Returns final params."""
    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                           length=n_steps)
        return params, losses

    params, losses = run(params0)
    return jax.tree_util.tree_map(np.asarray, params), np.asarray(losses)


def ttfb_model_loss(data, control, Tmax):
    r"""Negative log-likelihood of the time-to-first-binding model,
    Eq. 4 and Eq. 7 of Friedman & Gelles 2015 (reference:
    mle_analysis.py:37-104).

    p(tau) = Af * Exp(ka + kns) + (1 - Af) * Exp(kns), censored at Tmax;
    control locations follow Exp(kns) only.

    :param data: (B, N) ttfb at target locations (B bootstrap/posterior rows).
    :param control: (B, Nc) ttfb at control locations, or None.
    :return: loss(params) with params dict holding unconstrained log_ka,
        log_kns, logit_Af of shape (B, 1).
    """
    data = jnp.asarray(data)
    control = None if control is None else jnp.asarray(control)

    def loss(params):
        ka = jnp.exp(params["log_ka"])
        kns = jnp.exp(params["log_kns"])
        Af = jax.nn.sigmoid(params["logit_Af"])
        k1 = ka + kns  # active
        k0 = kns  # inactive

        mid = (data < Tmax) & (data > 0)
        tau = jnp.where(mid, data, 1.0)
        lp1 = jnp.where(data == Tmax, -k1 * Tmax, 0.0) + jnp.where(
            mid, jnp.log(k1) - k1 * tau, 0.0
        )
        lp0 = jnp.where(data == Tmax, -k0 * Tmax, 0.0) + jnp.where(
            mid, jnp.log(k0) - k0 * tau, 0.0
        )
        ll = jnp.logaddexp(jnp.log(Af) + lp1, jnp.log1p(-Af) + lp0).sum()

        if control is not None:
            midc = (control < Tmax) & (control > 0)
            tauc = jnp.where(midc, control, 1.0)
            ll = ll + (
                jnp.where(control == Tmax, -kns * Tmax, 0.0)
                + jnp.where(midc, jnp.log(kns) - kns * tauc, 0.0)
            ).sum()
        return -ll

    return loss


def ttfb_mle(data, control, Tmax, lr=5e-3, n_steps=2000):
    """Fit ka / kns / Af by MLE; returns dict of (B, 1) constrained values."""
    B = np.asarray(data).shape[0]
    params0 = {
        "log_ka": jnp.log(jnp.full((B, 1), 0.001)),
        "log_kns": jnp.log(jnp.full((B, 1), 0.001)),
        "logit_Af": jnp.full((B, 1), jax.scipy.special.logit(0.9)),
    }
    params, losses = train(ttfb_model_loss(data, control, Tmax), params0,
                           lr=lr, n_steps=n_steps)
    return {
        "ka": np.exp(params["log_ka"]),
        "kns": np.exp(params["log_kns"]),
        "Af": 1 / (1 + np.exp(-params["logit_Af"])),
        "losses": losses,
    }


def exp_model_loss(data, K):
    r"""Negative log-likelihood of a K-exponential dwell-time mixture
    (reference: mle_analysis.py:107-126).

    :param data: (B, N) dwell times, zero-padded.
    """
    data = jnp.asarray(data)

    def loss(params):
        k = jnp.exp(params["log_k"])  # (B, K)
        A = jax.nn.softmax(params["logits_A"], axis=-1)  # (B, K)
        lp = (
            jnp.log(A)[:, None, :]
            + jnp.log(k)[:, None, :]
            - k[:, None, :] * data[..., None]
        )  # (B, N, K)
        ll = jnp.where(data > 0, jax.scipy.special.logsumexp(lp, -1), 0.0)
        return -ll.sum()

    return loss


def exp_mle(data, K, lr=5e-3, n_steps=2000):
    """Fit a K-exponential mixture; returns k (B, K), A (B, K)."""
    B = np.asarray(data).shape[0]
    params0 = {
        "log_k": jnp.log(
            jnp.broadcast_to(jnp.logspace(-K + 1, 0, K), (B, K))
        ),
        "logits_A": jnp.zeros((B, K)),
    }
    params, losses = train(exp_model_loss(data, K), params0, lr=lr,
                           n_steps=n_steps)
    A = np.exp(params["logits_A"])
    A = A / A.sum(-1, keepdims=True)
    return {"k": np.exp(params["log_k"]), "A": A, "losses": losses}
