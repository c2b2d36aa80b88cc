"""crosstalk: multi-color time-independent model with spectral bleed-through.

TPU-native re-design of the reference model (tapqir/models/crosstalk.py:26-574).
Q fluorescent dyes bleed into C channels through a Dirichlet-prior crosstalk
matrix alpha (Q, C) (reference: crosstalk.py:82-87). Each dye q has its own
discrete latents (z_q, theta_q, m_kq); the discrete structure factorizes per
dye, so the per-dye tables from cosmos are reused and only the image
likelihood couples dyes: the expectation over m runs over all 2^(K*Q) global
spot-presence configurations (the reference enumerates the same joint space
through Q*(K+2) enumeration dims, crosstalk.py:486-488).
"""

import jax.numpy as jnp
import numpy as np

from tapqir_tpu import constraints
from tapqir_tpu.distributions.core import dirichlet_log_prob, dirichlet_sample
from tapqir_tpu.distributions.ksmogn import (
    offset_gamma_factored_summed,
    offset_gamma_log_prob_summed,
)
from tapqir_tpu.distributions.util import gaussian_spots_flat
from tapqir_tpu.infer.discrete import m_configs
from tapqir_tpu.models.cosmos import cosmos

__all__ = ["crosstalk"]


def _global_m_configs(K, Q):
    """(2^(K*Q), Q, K) table of global spot-presence configurations and the
    (2^(K*Q), Q) per-dye config index."""
    Mq = 1 << K
    Mf = Mq**Q
    full = np.zeros((Mf, Q, K))
    cfg_idx = np.zeros((Mf, Q), np.int64)
    base = m_configs(K)  # (Mq, K)
    for g in range(Mf):
        for q in range(Q):
            gq = (g // (Mq**q)) % Mq
            cfg_idx[g, q] = gq
            full[g, q] = base[gq]
    onehot = np.zeros((Mf, Q, Mq))
    for g in range(Mf):
        for q in range(Q):
            onehot[g, q, cfg_idx[g, q]] = 1.0
    return full, onehot


class crosstalk(cosmos):
    r"""Multi-Color Time-Independent Colocalization Model with Cross-Talk."""

    name = "crosstalk"

    def __init__(self, S=1, K=2, Q=None, device=None, dtype="float32",
                 use_pallas=None, priors=None, vectorized=True):
        super().__init__(
            S=S, K=K, Q=Q, device=device, dtype=dtype,
            use_pallas=use_pallas, priors=priors, vectorized=vectorized,
        )
        self._global_params = ["gain", "proximity", "lamda", "pi", "alpha"]
        self.ci_params = [
            "alpha", "gain", "pi", "lamda", "proximity",
            "background", "height", "width", "x", "y",
        ]

    # -- parameters (reference: crosstalk.py:429-462) ---------------------------
    def param_spec(self):
        spec = super().param_spec()
        Q, C = self.Q, self.data.C
        # alpha init: ones + 9*eye, normalized by the simplex transform
        alpha_init = np.ones((Q, C)) + np.eye(Q, C) * 9.0
        alpha_init = alpha_init / alpha_init.sum(-1, keepdims=True)
        spec["alpha_mean"] = (alpha_init, constraints.simplex())
        spec["alpha_size"] = (np.full((Q, 1), 2.0), constraints.positive())
        return spec

    def _extra_global_concs(self, pc):
        """alpha joins the packed global draw (event axis last)."""
        return ["alpha"], [pc("alpha_mean") * pc("alpha_size")]

    def _extra_global_terms(self, pc, extras, global_term):
        """alpha ~ Dirichlet(1 + 9I) prior + guide entropy; the sample is
        stashed for the likelihood (reference: crosstalk.py:82-87,298-303)."""
        Q, C = self.Q, self.data.C
        alpha_conc = pc("alpha_mean") * pc("alpha_size")
        alpha = extras["alpha"]  # (Q, C)
        self._alpha_sample = alpha
        prior_conc = jnp.asarray(
            np.ones((Q, C)) + np.eye(Q, C) * 9.0, self.dtype
        )
        return global_term + (
            dirichlet_log_prob(alpha, prior_conc)
            - dirichlet_log_prob(alpha, alpha_conc)
        ).sum()

    def _local_marginalized(
        self, pc, obs, target_locs, ont, gain, pi, lamda, prox, b,
        h, w, xs, ys, qm,
        h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size, data,
    ):
        """Expectation over all 2^(K*Q) global m-configs; the alpha-mixed
        image couples dyes (reference KSMOGN alpha path, ksmogn.py:95-106)."""
        K, Q = self.K, self.Q
        C = self.data.C
        P = self.data.P
        dtype = self.dtype
        alpha = self._alpha_sample  # (Q, C)

        inner, term_hw, log_qm, term_q = self._dye_tables(
            ont, pi, lamda, prox, h, w, xs, ys, qm,
            h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size,
        )  # each (Mq, n, f, Q)

        mtab_full_np, onehot = _global_m_configs(K, Q)  # (Mf, Q, K) 0/1
        onehot = jnp.asarray(onehot, dtype)  # (Mf, Q, Mq)

        # combine per-dye tables into global-config tables (Mf, n, f)
        def combine(tab):
            return jnp.einsum("gqm,mnfq->gnf", onehot, tab)

        inner_g = combine(inner)
        term_hw_g = combine(term_hw)
        log_qm_g = combine(log_qm)
        term_q_g = combine(term_q)
        wq = jnp.exp(log_qm_g)

        # alpha-mixed likelihood: dye q's spot is rendered in every channel c
        # at that channel's target coordinates (reference: ksmogn.py:95-106,
        # target_locs unsqueezed over the dye axis), scaled by alpha[q, c].
        # Dense default (round-4-proven): (Mf, batch, EVP) concentrations by
        # einsum + summed kernel; use_factored=True folds alpha into
        # spot-major deltas and assembles the 2^(K*Q) configs INSIDE the
        # factored kernel (5 exps per pixel-offset instead of 16) — see
        # cosmos._likelihood / docs/kernel_analysis.md for the A/B.
        n_, f_ = obs.shape[:2]
        ev_pad = obs.shape[-1]
        Mf = mtab_full_np.shape[0]
        nfc = n_ * f_ * C
        if getattr(self, "use_factored", False):

            def qk_major(a):  # (n, f, Q, K) -> (Q, K, n, f, 1, 1)
                return jnp.moveaxis(a, (2, 3), (0, 1))[..., None, None]

            h_mixed = qk_major(h) * alpha[:, None, None, None, :, None]
            spots = gaussian_spots_flat(
                h_mixed, qk_major(w), qk_major(xs), qk_major(ys),
                target_locs[None, None], P, ev_pad,
            )  # (Q, K, n, f, C, 1, EVP)
            out = offset_gamma_factored_summed(
                obs.reshape(nfc, ev_pad),
                b.reshape(-1) / gain,
                spots[..., 0, :].reshape(Q * K, nfc, ev_pad) / gain,
                mtab_full_np.reshape(Mf, Q * K),
                1.0 / gain,
                data["offset_samples"], data["offset_logits"],
                ev=P * P, use_pallas=self.use_pallas,
            )
        else:
            gauss = gaussian_spots_flat(
                h[..., None, :], w[..., None, :], xs[..., None, :],
                ys[..., None, :], target_locs[..., None, :, :], P, ev_pad,
            )  # (n, f, Q, C, K, EVP)
            gauss_flat = gauss.reshape(n_ * f_, Q, C, K, ev_pad)
            img_flat = b.reshape(n_ * f_, C, 1) + jnp.einsum(
                "gqk,qc,xqckp->gxcp",
                jnp.asarray(mtab_full_np, gauss.dtype), alpha, gauss_flat,
            )  # (Mf, nf, C, EVP)
            out = offset_gamma_log_prob_summed(
                obs.reshape(nfc, ev_pad),
                img_flat.reshape(Mf, nfc, ev_pad) / gain,
                1.0 / gain,
                data["offset_samples"], data["offset_logits"],
                event_ndims=1, use_pallas=self.use_pallas, ev=P * P,
            )
        loglik = out.reshape(Mf, n_, f_, C).sum(-1)  # event dims (C, P, P)

        local = (
            wq * (inner_g + term_hw_g + loglik - log_qm_g - term_q_g)
        ).sum(0)  # (n, f)
        # the caller adds (n, f, C) background terms and sums; spreading the
        # (n, f) total uniformly over the C axis keeps that sum exact
        return local[..., None] / C