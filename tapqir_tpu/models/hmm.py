"""hmm: multi-color hidden Markov colocalization model ("cosmos+hmm").

TPU-native re-design of the reference model (tapqir/models/hmm.py:28-675).
The reference requires the funsor backend: a vectorized-Markov messenger
(tapqir/handlers.py:18-207), a custom TraceMarkovEnum_ELBO
(tapqir/infer/elbo.py:18-86) and a modified partial-sum-product with a
Blelloch parallel scan (tapqir/infer/sum_product.py:130-359). Here the same
math is derived in closed form:

* the guide over the z-chain is an explicit inhomogeneous Markov chain
  q(z_f | z_{f-1}) with parameter ``z_trans`` (Nt, F, C, 1+S, 1+S)
  (reference: hmm.py:445-456);
* its marginals gamma_f and pairwise marginals xi_f come from ONE
  ``jax.lax.associative_scan`` of log-transition matrices (O(log F) depth);
* E_q[log p - log q] over the chain decomposes into
  sum_f E_{xi_f}[log p(z_f | z_{f-1}, trans) - log q(z_f | z_{f-1})]
  plus sum_f sum_s gamma_f(s) * l_f(s), where l_f(s) is the per-frame
  cosmos-style expectation (theta marginalized, m enumerated given z=s);
* no frame subsampling: the chain needs every frame, matching the reference
  (hmm.py:119-131 subsamples only AOIs).
"""

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from tapqir_tpu import constraints
from tapqir_tpu.distributions.core import (
    affine_beta_concentrations,
    affine_beta_log_prob,
    affine_beta_sample,
    beta_from_gamma_pair,
    dirichlet_from_gammas,
    dirichlet_log_prob,
    dirichlet_sample,
    exponential_log_prob,
    gamma_log_prob,
    gamma_sample,
    halfnormal_log_prob,
    std_gamma_sample_packed,
)
from tapqir_tpu.distributions.util import expand_offtarget
from tapqir_tpu.infer.discrete import (
    log_probs_m,
    log_probs_theta,
    log_probs_z,
    m_configs,
    safe_log,
)
from tapqir_tpu.models.cosmos import cosmos
from tapqir_tpu.ops.scan import (
    cumulative_logmatmulexp,
    logmatmulexp,
    sharded_cumulative_logmatmulexp,
)

__all__ = ["hmm"]


class hmm(cosmos):
    r"""Multi-Color Hidden Markov Colocalization Model.

    z follows a Markov chain with Dirichlet-prior init/trans probabilities
    (reference: hmm.py:87-98); everything else matches cosmos.
    """

    name = "cosmos+hmm"
    # the z-chain couples frames: the sharded step must pick the same AOI
    # batch on every frame shard of a mesh row and run the chain terms with
    # cross-shard boundary exchange (see elbo / parallel/sharding.py)
    frame_coupled = True

    def __init__(self, S=1, K=2, device=None, dtype="float32",
                 use_pallas=None, vectorized=True, priors=None):
        super().__init__(
            S=S, K=K, Q=None, device=device, dtype=dtype,
            use_pallas=use_pallas, priors=priors, vectorized=vectorized,
        )
        self._global_params = ["gain", "proximity", "lamda", "trans"]
        self.ci_params = [
            "gain", "init", "trans", "lamda", "proximity",
            "background", "height", "width", "x", "y",
        ]

    # -- parameters (reference: hmm.py:416-467) --------------------------------
    def param_spec(self):
        spec = super().param_spec()
        data = self.data
        K, Q, S = self.K, self.Q, self.S
        Nt, F, C = data.Nt, data.F, data.C
        del spec["pi_mean"], spec["pi_size"]
        spec["init_mean"] = (np.ones((Q, S + 1)) / (S + 1), constraints.simplex())
        spec["init_size"] = (np.full((Q, 1), 2.0), constraints.positive())
        spec["trans_mean"] = (
            np.ones((Q, S + 1, S + 1)) / (S + 1), constraints.simplex()
        )
        spec["trans_size"] = (np.full((Q, S + 1, 1), 2.0), constraints.positive())
        spec["z_trans"] = (
            np.full((Nt, F, C, S + 1, S + 1), 1.0 / (S + 1)), constraints.simplex()
        )
        spec["m_probs"] = (
            np.full((S + 1, K, Nt, F, C), 0.5), constraints.unit_interval()
        )
        return spec

    def param_partition(self):
        from jax.sharding import PartitionSpec as P

        # frames shard like cosmos: the chain marginalization runs as a
        # sequence-parallel prefix scan over the mesh's "frame" axis
        # (ops/scan.py:32-64), so long-F datasets split across chips
        spec = super().param_partition()
        spec["z_trans"] = P("aoi", "frame", None, None, None)
        spec["m_probs"] = P(None, None, "aoi", "frame", None)
        for name in ("init_mean", "init_size", "trans_mean", "trans_size"):
            spec[name] = P()
        return spec

    def _log_feasible_m(self, dtype):
        """(M, 1+S) log-mask of feasible m-configs given z: z > 0 requires at
        least one spot present (theta points at a present spot)."""
        from tapqir_tpu.infer.discrete import NEG_INF

        mtab = m_configs(self.K)  # (M, K)
        feasible = np.ones((mtab.shape[0], self.S + 1))
        feasible[mtab.sum(-1) == 0, 1:] = 0.0
        return jnp.asarray(np.where(feasible > 0, 0.0, NEG_INF), dtype)

    # -- ELBO -------------------------------------------------------------------
    def elbo(self, params_u, key, data, n_shards=1, frame_shards=1,
             frame_axis=None, key_ndx=None, chain_prefix=None,
             return_batch=False):
        """Marginalized ELBO with the z-chain contracted by parallel scan.

        AOI-subsampled only; all frames participate (reference hmm
        subsamples only AOIs, hmm.py:119-125).

        Frame sharding (``frame_axis`` set, inside shard_map): the local
        prefix scan is promoted to global prefixes by the sequence-parallel
        scan, the chain boundary pair (last frame of the previous shard,
        first local frame) arrives by ``ppermute`` over ICI, and only frame
        rank 0 scores the chain-init term. ``key_ndx`` must be shared by all
        frame shards of a mesh row so they subsample the same AOIs.

        ``chain_prefix`` ((n, C, S1, S1) log prefix product of all earlier
        frame blocks) emulates a non-first frame shard on a single device -
        used by the exact parity tests.
        """
        Nt = data["images"].shape[0]
        n = min(self.nbatch_size, Nt)
        k_n, key_global, key_local = jax.random.split(key, 3)
        if key_ndx is not None:
            k_n = key_ndx  # shared across the frame shards of a mesh row
        ndx = jax.random.permutation(k_n, Nt)[:n]
        win = self.gather_windows(params_u, ndx, None, None)
        value = self.elbo_from_windows(
            win, key_global, key_local, ndx, None, None, data,
            n_shards=n_shards, frame_shards=frame_shards,
            frame_axis=frame_axis, chain_prefix=chain_prefix,
        )
        if return_batch:
            return value, (ndx, None)  # AOI-subsampled only: all frames
        return value

    def _draw_batch(self, key, data):
        """AOI subsampling draw + per-section keys (no frame subsampling:
        the z-chain needs every frame, reference hmm.py:119-125)."""
        Nt = data["images"].shape[0]
        n = min(self.nbatch_size, Nt)
        k_n, k_global, k_local = jax.random.split(key, 3)
        ndx = jax.random.permutation(k_n, Nt)[:n]
        return ndx, None, None, k_global, k_local

    def elbo_from_windows(self, win, key_global, key_local, ndx, f0, f_b,
                          data, n_shards=1, frame_shards=1, frame_axis=None,
                          chain_prefix=None):
        """ELBO from pre-gathered parameter windows (full-frame AOI rows;
        see :meth:`Model.gather_windows`). The optimizer step differentiates
        THIS function so gradients stay window-shaped."""
        S, K, Q = self.S, self.K, self.Q
        S1 = S + 1
        P = self.data.P
        dtype = self.dtype
        priors = self.priors
        lim = (P + 1) / 2
        wmin, wmax = priors["width_min"], priors["width_max"]
        prox_high = (P + 1) / math.sqrt(12)
        Nt = data["images"].shape[0]
        n = ndx.shape[0]
        scale_n = Nt / n
        tf = self._transforms

        def pc(name):
            return tf[name](win[name])

        def g1(name):  # window (n, ...), constrained
            return tf[name](win[name])

        def gk(name):  # window (K, n, F, Q) -> (n, F, Q, K), constrained
            return tf[name](jnp.moveaxis(win[name], 0, -1))

        # images live flat-lane-padded on device: (Nt, F, C, EVP)
        # ONE flat row gather on the (Nt*F, ...) view, exactly like cosmos
        # (models/cosmos.py:_elbo_terms): a plain take along axis 0 of the
        # 4D stack makes XLA relayout-copy the ENTIRE image array inside
        # every step (2.3 ms/step at eLife scale, profiled round 4) to
        # reconcile the gather's layout with the kernel consumer's
        F_l = data["images"].shape[1]
        flat_ndx = (
            ndx[:, None] * F_l + jnp.arange(F_l)[None, :]
        ).reshape(-1)

        def g2a(arr):
            flat = arr.reshape((arr.shape[0] * arr.shape[1],) + arr.shape[2:])
            return jnp.take(flat, flat_ndx, 0).reshape(
                (n, F_l) + arr.shape[2:]
            )

        obs = g2a(data["images"])  # (n, F, C, EVP)
        target_locs = g2a(data["xy"])
        ont = jnp.take(data["is_ontarget"], ndx)
        mask = jnp.take(data["mask"], ndx)

        # ---- ALL guide-site draws: ONE packed std-gamma call (the global
        # elements ride the big local pack - a separate tiny pack costs
        # ~0.45 ms/step of latency-bound while iterations, profiled) --------
        del key_global  # merged draw keyed by key_local
        gain_conc = pc("gain_loc") * pc("gain_beta")
        init_conc = pc("init_mean") * pc("init_size")
        trans_conc = pc("trans_mean") * pc("trans_size")
        lamda_conc = pc("lamda_loc") * pc("lamda_beta")
        pg1, pg0 = affine_beta_concentrations(
            pc("proximity_loc"), pc("proximity_size"), 0.0, prox_high
        )
        b_loc, b_beta = g1("b_loc"), g1("b_beta")  # (n, F, C)
        h_loc, h_beta = gk("h_loc"), gk("h_beta")  # (n, F, Q, K)
        w_mean, w_size = gk("w_mean"), gk("w_size")
        x_mean, y_mean = gk("x_mean"), gk("y_mean")
        size = gk("size")
        wc1, wc0 = affine_beta_concentrations(w_mean, w_size, wmin, wmax)
        xc1, xc0 = affine_beta_concentrations(x_mean, size, -lim, lim)
        yc1, yc0 = affine_beta_concentrations(y_mean, size, -lim, lim)
        (g_gain, g_lamda, g_init, g_trans, g_p1, g_p0,
         gb, gh, gw1, gx1, gy1, gw0, gx0, gy0) = std_gamma_sample_packed(
            key_local,
            [
                jnp.reshape(gain_conc, (1,)),
                lamda_conc,
                init_conc,
                trans_conc,
                jnp.reshape(pg1, (1,)),
                jnp.reshape(pg0, (1,)),
                b_loc * b_beta,
                h_loc * h_beta,
                wc1, xc1, yc1, wc0, xc0, yc0,
            ],
        )
        gain = g_gain[0] / pc("gain_beta")
        lamda = g_lamda / pc("lamda_beta")
        init = dirichlet_from_gammas(g_init)  # (Q, S1)
        trans = dirichlet_from_gammas(g_trans)  # (Q, S1, S1)
        prox = prox_high * beta_from_gamma_pair(g_p1[0], g_p0[0])
        b = gb / b_beta
        h = gh / h_beta
        w = wmin + (wmax - wmin) * beta_from_gamma_pair(gw1, gw0)
        xs = -lim + 2 * lim * beta_from_gamma_pair(gx1, gx0)
        ys = -lim + 2 * lim * beta_from_gamma_pair(gy1, gy0)

        global_term = (
            halfnormal_log_prob(gain, priors["gain_std"])
            - gamma_log_prob(gain, gain_conc, pc("gain_beta"))
            + (
                dirichlet_log_prob(init, jnp.full((Q, S1), 1.0 / S1, dtype))
                - dirichlet_log_prob(init, init_conc)
            ).sum()
            + (
                dirichlet_log_prob(trans, jnp.full((Q, S1, S1), 1.0 / S1, dtype))
                - dirichlet_log_prob(trans, trans_conc)
            ).sum()
            + (
                exponential_log_prob(lamda, priors["lamda_rate"])
                - gamma_log_prob(lamda, lamda_conc, pc("lamda_beta"))
            ).sum()
            + exponential_log_prob(prox, priors["proximity_rate"])
            - affine_beta_log_prob(
                prox, pc("proximity_loc"), pc("proximity_size"), 0.0, prox_high
            )
        ) / n_shards

        # ---- per-AOI Delta sites ------------------------------------------------
        bm = g1("background_mean_loc")[:, 0, :]  # (n, C)
        bs = g1("background_std_loc")[:, 0, :]
        aoi_term = (
            (
                halfnormal_log_prob(bm, priors["background_mean_std"])
                + halfnormal_log_prob(bs, priors["background_std_std"])
            )
            * mask[:, None]
        ).sum()

        # ---- z-chain: marginals via parallel scan --------------------------------
        A = g1("z_trans")  # (n, F, C, S1, S1), rows are q(z_f | z_{f-1})
        logA = jnp.log(A)
        if frame_axis is not None:
            # sequence-parallel: local Blelloch scan + all_gather of block
            # totals promotes local prefixes to GLOBAL prefix products
            alphas = sharded_cumulative_logmatmulexp(logA, 1, frame_axis)
        else:
            alphas = cumulative_logmatmulexp(logA, axis=1)  # prefix products
            if chain_prefix is not None:  # emulate a non-first frame block
                alphas = logmatmulexp(chain_prefix[:, None], alphas)
        log_gamma = alphas[..., 0, :]  # (n, F, C, S1): global q(z_f)
        gamma = jnp.exp(log_gamma)

        lp_init = log_probs_z(init, ont)  # (n, Q, S1)
        trans_ext = expand_offtarget(trans)  # (Q, S1, S1, 2)
        lp_trans = jnp.moveaxis(safe_log(trans_ext)[..., ont], -1, 0)  # (n,Q,S1,S1)

        q0 = A[:, 0, :, 0, :]  # (n, C, S1): chain start (frame rank 0 only)
        init_term = (q0 * (lp_init - jnp.log(q0))).sum((-2, -1))  # (n,)
        xi = gamma[:, :-1, :, :, None] * A[:, 1:]  # (n, F-1, C, S1, S1)
        interior_term = (xi * (lp_trans[:, None] - logA[:, 1:])).sum((1, 2, 3, 4))

        def boundary_term(gamma_prev):
            # pair (last frame of the previous block, first local frame)
            bxi = gamma_prev[..., :, None] * A[:, 0]  # (n, C, S1, S1)
            return (bxi * (lp_trans - logA[:, 0])).sum((1, 2, 3))

        if frame_axis is not None:
            n_fr = jax.lax.axis_size(frame_axis)
            rank = jax.lax.axis_index(frame_axis)
            perm = [(i, (i + 1) % n_fr) for i in range(n_fr)]
            # previous shard's last marginal, shipped right by one over ICI
            gamma_prev = jax.lax.ppermute(gamma[:, -1], frame_axis, perm)
            chain_term = (
                jnp.where(rank == 0, init_term, boundary_term(gamma_prev))
                + interior_term
            )
        elif chain_prefix is not None:
            gamma_prev = jnp.exp(chain_prefix[..., 0, :])
            chain_term = boundary_term(gamma_prev) + interior_term
        else:
            chain_term = init_term + interior_term

        # ---- continuous log-probs (samples drawn in the merged pack above) -----
        lp_b = gamma_log_prob(
            b, (bm / bs)[:, None, :] ** 2, (bm / bs**2)[:, None, :]
        )
        lq_b = gamma_log_prob(b, b_loc * b_beta, b_beta)

        # q(m | z): window (S1, K, n, F, C) -> (S1, n, F, C, K)
        qm = tf["m_probs"](jnp.moveaxis(win["m_probs"], 1, -1))

        # ---- per-frame local terms conditioned on z = s -----------------------------
        mtab = jnp.asarray(m_configs(K), dtype)  # (M, K)
        lpt = log_probs_theta(K, S, dtype)  # (S1, 1+K)
        lpm1, lpm0 = log_probs_m(lamda, K)  # (Q, 1+K, K)
        log_pm_sum = jnp.einsum("mk,qtk->mtq", mtab, lpm1) + jnp.einsum(
            "mk,qtk->mtq", 1.0 - mtab, lpm0
        )

        size_sp = ((P + 1) / (2 * prox)) ** 2 - 1.0
        lpxy_ns = affine_beta_log_prob(xs, 0.0, 2.0, -lim, lim) + affine_beta_log_prob(
            ys, 0.0, 2.0, -lim, lim
        )
        lpxy_sp = affine_beta_log_prob(
            xs, 0.0, size_sp, -lim, lim
        ) + affine_beta_log_prob(ys, 0.0, size_sp, -lim, lim)
        spec_tk = jnp.asarray(np.arange(1 + K)[:, None] == 1 + np.arange(K), bool)
        lpxy_t = jnp.where(
            spec_tk[:, None, None, None, :], lpxy_sp[None], lpxy_ns[None]
        )
        term_xy = jnp.einsum("mk,tnfqk->mtnfq", mtab, lpxy_t)  # (M, 1+K, n, F, Q)

        # T over (m, z, theta); theta contracted, z kept for the chain
        T_full = (
            lpt[None, :, :, None, None, None]  # (1, S1, 1+K, 1, 1, 1)
            + log_pm_sum[:, None, :, None, None, :]  # (M, 1, 1+K, 1, 1, Q)
            + term_xy[:, None]  # (M, 1, 1+K, n, F, Q)
        )
        inner = logsumexp(T_full, axis=2)  # (M, S1, n, F, Q)

        lph = halfnormal_log_prob(h, priors["height_std"])
        lpw = affine_beta_log_prob(w, 1.5, 2.0, wmin, wmax)
        term_hw = jnp.einsum("mk,nfqk->mnfq", mtab, lph + lpw)

        # flat lane-padded pixel layout end-to-end (see cosmos._likelihood:
        # dense einsum + summed kernel by default, factored kernel opt-in)
        ev_pad = obs.shape[-1]
        loglik = self._likelihood(
            obs, b, h, w, xs, ys, target_locs, gain, data, ev_pad
        )  # (M, n, F, C)

        log_qm = jnp.einsum("mk,snfqk->msnfq", mtab, jnp.log(qm)) + jnp.einsum(
            "mk,snfqk->msnfq", 1.0 - mtab, jnp.log1p(-qm)
        )  # (M, S1, n, F, Q)
        # Restrict q(m | z) to feasible configs: given z > 0 some spot must be
        # present (theta in {1..K} forces m_theta = 1), so the all-zero m has
        # zero model probability. The reference's unrestricted Bernoulli
        # guide makes the exact ELBO -inf at its own default init
        # (m_probs = 0.5, hmm.py:457-465); renormalizing over the feasible
        # support is the correct limit of that family and keeps the
        # estimator finite.
        log_qm = log_qm + self._log_feasible_m(dtype)[:, :, None, None, None]
        log_qm = log_qm - logsumexp(log_qm, axis=0, keepdims=True)
        wq = jnp.exp(log_qm)
        # zero-weight configs can carry -1e30 costs; neutralize exactly
        log_qm = jnp.where(wq > 0.0, log_qm, 0.0)
        lqh = gamma_log_prob(h, h_loc * h_beta, h_beta)
        lqw = affine_beta_log_prob(w, w_mean, w_size, wmin, wmax)
        lqx = affine_beta_log_prob(xs, x_mean, size, -lim, lim)
        lqy = affine_beta_log_prob(ys, y_mean, size, -lim, lim)
        term_q = jnp.einsum("mk,nfqk->mnfq", mtab, lqh + lqw + lqx + lqy)

        ell = (
            wq
            * (
                inner
                + (term_hw + loglik - term_q)[:, None]
                - log_qm
            )
        ).sum(0)  # (S1, n, F, Q)

        frames_term = (gamma.transpose(3, 0, 1, 2) * ell).sum(0) + lp_b - lq_b
        local_sum = (frames_term.sum((1, 2)) + chain_term) * mask
        return global_term + (
            aoi_term / frame_shards + local_sum.sum()
        ) * scale_n

    # -- posteriors (reference: hmm.py:541-667) -----------------------------------
    @property
    def z_probs(self):
        r"""q(z_f) marginals from the chain prefix product, (Nt, F, C, 1+S)."""
        if not hasattr(self, "_z_probs_cache"):
            A = jnp.asarray(self.param("z_trans"), self.dtype)
            logA = jnp.log(jnp.clip(A, 1e-30, None))
            alphas = cumulative_logmatmulexp(logA, axis=1)
            self._z_probs_cache = np.asarray(
                jnp.exp(alphas[..., 0, :]), np.float64
            )
        return self._z_probs_cache

    @property
    def pspecific(self):
        return self.z_probs

    @property
    def theta_probs(self):
        r"""q(theta = k, z = z_MAP), shape (K, Nt, F, Q)
        (reference: hmm.py:541-625)."""
        if not hasattr(self, "_theta_probs_cache"):
            self._theta_probs_cache = self._compute_theta_probs()
        return self._theta_probs_cache

    @property
    def compute_probs(self):
        return self.z_probs, self.theta_probs

    def compute_probs_arrays(self, num_particles=50, key=None):
        return self.z_probs, self._compute_theta_probs(num_particles, key)

    @property
    def m_probs(self):
        r"""q(m = 1, z = z_MAP) (reference: hmm.py:650-656)."""
        qm = self.param("m_probs")  # (S1, K, Nt, F, C)
        z_map = self.z_map  # (Nt, F, C)
        qm_z = np.moveaxis(qm, (0, 1), (-1, 0))  # (K, Nt, F, C, S1)
        return np.take_along_axis(qm_z, z_map[None, ..., None], axis=-1)[..., 0]

    def _compute_theta_probs(self, num_particles=50, key=None):
        S, K, Q = self.S, self.K, self.Q
        P = self.data.P
        dtype = self.dtype
        key = jax.random.PRNGKey(0) if key is None else key
        Nt, F = self.data.Nt, self.data.F
        N = self.data.N
        nb = self.nbatch_size
        pc = self.constrained()
        data = getattr(self, "_data_dev", None) or self._data_device_arrays()
        z_map_full = jnp.asarray(self.z_map, jnp.int32)
        theta_probs = np.zeros((K, Nt, F, Q), np.float64)

        lim = (P + 1) / 2
        prox_high = (P + 1) / math.sqrt(12)
        mtab = jnp.asarray(m_configs(K), dtype)
        lpt = log_probs_theta(K, S, dtype)

        def block(pc, key, ndx, z_map):
            x_mean = jnp.moveaxis(jnp.take(pc["x_mean"], ndx, 1), 0, -1)
            y_mean = jnp.moveaxis(jnp.take(pc["y_mean"], ndx, 1), 0, -1)
            size = jnp.moveaxis(jnp.take(pc["size"], ndx, 1), 0, -1)
            qm_all = jnp.moveaxis(
                jnp.take(pc["m_probs"], ndx, 2), 1, -1
            )  # (S1, n, F, C, K)
            # select q(m | z_map): (n, F, C, K)
            qm = jnp.take_along_axis(
                qm_all, z_map[None, ..., None], axis=0
            )[0]

            def one_particle(k):
                ks = jax.random.split(k, 4)
                lamda = gamma_sample(
                    ks[0], pc["lamda_loc"] * pc["lamda_beta"], pc["lamda_beta"]
                )
                prox = affine_beta_sample(
                    ks[1], pc["proximity_loc"], pc["proximity_size"], 0.0, prox_high
                )
                xs = affine_beta_sample(ks[2], x_mean, size, -lim, lim)
                ys = affine_beta_sample(ks[3], y_mean, size, -lim, lim)

                lpm1, lpm0 = log_probs_m(lamda, K)
                log_pm_sum = jnp.einsum("mk,qtk->mtq", mtab, lpm1) + jnp.einsum(
                    "mk,qtk->mtq", 1.0 - mtab, lpm0
                )
                size_sp = ((P + 1) / (2 * prox)) ** 2 - 1.0
                lpxy_ns = affine_beta_log_prob(
                    xs, 0.0, 2.0, -lim, lim
                ) + affine_beta_log_prob(ys, 0.0, 2.0, -lim, lim)
                lpxy_sp = affine_beta_log_prob(
                    xs, 0.0, size_sp, -lim, lim
                ) + affine_beta_log_prob(ys, 0.0, size_sp, -lim, lim)
                spec_tk = jnp.asarray(
                    np.arange(1 + K)[:, None] == 1 + np.arange(K), bool
                )
                lpxy_t = jnp.where(
                    spec_tk[:, None, None, None, :], lpxy_sp[None], lpxy_ns[None]
                )
                term_xy = jnp.einsum("mk,tnfqk->mtnfq", mtab, lpxy_t)

                # T conditioned on z = z_map
                lpt_z = lpt[z_map]  # (n, F, C, 1+K)
                T = (
                    jnp.moveaxis(lpt_z, -1, 0)[None]  # (1, 1+K, n, F, Q)
                    + log_pm_sum[:, :, None, None, :]  # (M, 1+K, 1, 1, Q)
                    + term_xy  # (M, 1+K, n, F, Q)
                )
                T_norm = T - logsumexp(T, axis=1, keepdims=True)
                log_qm = jnp.einsum(
                    "mk,nfqk->mnfq", mtab, jnp.log(qm)
                ) + jnp.einsum("mk,nfqk->mnfq", 1.0 - mtab, jnp.log1p(-qm))
                # feasibility renormalization given z_map (see elbo)
                feas = self._log_feasible_m(dtype)  # (M, S1)
                log_qm = log_qm + jnp.moveaxis(feas[:, z_map], 0, 0)
                log_qm = log_qm - logsumexp(log_qm, axis=0, keepdims=True)
                r = logsumexp(T_norm + log_qm[:, None], axis=0)  # (1+K, n, F, Q)
                return jnp.exp(r)[1:]  # (K, n, F, Q)

            keys = jax.random.split(key, num_particles)
            return jax.vmap(one_particle)(keys).mean(0)

        fn = jax.jit(block)
        for n0 in range(0, N, nb):
            ndx_np = np.arange(n0, min(n0 + nb, N))
            ndx = np.pad(ndx_np, (0, nb - len(ndx_np)), mode="edge")
            key, sub = jax.random.split(key)
            th = fn(pc, sub, jnp.asarray(ndx), z_map_full[jnp.asarray(ndx)])
            theta_probs[:, ndx_np] = np.asarray(th, np.float64)[:, : len(ndx_np)]
        return theta_probs

    def z_sample(self, num_samples, key=None):
        """Ancestral sampling of z trajectories from the q-chain
        (reference: hmm.py:658-667)."""
        key = jax.random.PRNGKey(11) if key is None else key
        A = jnp.asarray(self.param("z_trans")[: self.data.N], self.dtype)
        logA = jnp.log(jnp.clip(A, 1e-30, None))  # (N, F, C, S1, S1)
        k0, k1 = jax.random.split(key)
        z0 = jax.random.categorical(
            k0, logA[:, 0, :, 0, :], shape=(num_samples,) + logA.shape[:1] + logA.shape[2:3]
        )  # (num_samples, N, C)

        def step(z_prev, inp):
            logA_f, k = inp
            logits = jnp.take_along_axis(
                logA_f[None], z_prev[..., None, None], axis=-2
            )[..., 0, :]
            z = jax.random.categorical(k, logits)
            return z, z

        keys = jax.random.split(k1, self.data.F - 1)
        _, zs = jax.lax.scan(
            step, z0, (jnp.moveaxis(logA[:, 1:], 1, 0), keys)
        )
        out = jnp.concatenate([z0[None], zs], 0)  # (F, num_samples, N, C)
        return np.asarray(jnp.moveaxis(out, 0, 2))  # (num_samples, N, F, C)

    def compute_params(self, CI):
        params = super().compute_params(CI)
        params["z_trans"] = self.param("z_trans")
        return params

    # -- warm start from a converged cosmos fit --------------------------------
    def warm_start_from_cosmos(self, path=None, num_particles=25, key=None):
        """Initialize the guide from a converged cosmos fit in the same
        workspace — the reference's own recommended workflow (fit the
        time-independent cosmos model first, then the kinetic hmm; reference
        docs tutorials part_iii, tapqir/models/hmm.py:28-36).

        The mapping makes the hmm chain's marginals REPRODUCE the cosmos
        posterior exactly at step 0, with the chain prior (init/trans)
        estimated from that posterior:

        * ``z_trans`` rows <- cosmos ``q(z_f)`` marginals (a row-independent
          chain whose prefix products equal the cosmos marginals);
        * ``init``/``trans`` <- empirical start distribution and expected
          transition counts of the cosmos posterior over on-target AOIs —
          at a rare-event regime this lands near the true kon/koff, so the
          chain prior immediately penalizes the z-flicker that a cold
          uniform-``trans`` start never recovers from;
        * ``m_probs`` <- cosmos ``q(m)`` broadcast over the z-conditioning
          axis;
        * every shared continuous guide parameter (gain/lamda/proximity/
          background/height/width/x/y and their spreads) copied — in
          particular the proximity annealing (the slow axis of every cold
          fit) is already done.

        Must be called after :meth:`Model.init` (it resets the optimizer
        state and iteration counter). Returns self.
        """
        from tapqir_tpu.models.cosmos import cosmos as cosmos_cls

        path = Path(path) if path is not None else self.path
        run_path = path / ".tapqir"
        eps = 1e-5

        cm = cosmos_cls(
            S=self.S, K=self.K, dtype="float32"
            if self.dtype == jnp.float32 else "double",
            use_pallas=self.use_pallas, priors=self.priors,
        )
        cm.data = self.data
        cm.path = path
        cm.run_path = run_path
        spec = cm.param_spec()
        cm._transforms = {k: t for k, (v, t) in spec.items()}
        cm.load_checkpoint(path=run_path, param_only=True)

        Nt, F, C = self.data.Nt, self.data.F, self.data.C
        N = self.data.N
        S1 = self.S + 1

        # cosmos posterior marginals: reuse saved stats when present (the
        # cosmos fit pipeline ends in compute_stats), else compute them
        stats_path = path / "cosmos_params.tpqr"
        zp = None
        if stats_path.exists():
            with np.load(stats_path, allow_pickle=True) as z:
                if "z_probs" in z.files:
                    zp = np.asarray(z["z_probs"], np.float64)
        if zp is None or zp.shape != (Nt, F, self.Q, S1):
            cm.nbatch_size = self.nbatch_size or 10
            cm.fbatch_size = min(512, F)
            cm._data_dev = getattr(self, "_data_dev", None) or (
                self._data_device_arrays()
            )
            zp = cm.compute_probs_arrays(num_particles=num_particles,
                                         key=key)[0]

        zp = np.clip(np.asarray(zp, np.float64), eps, 1.0)
        zp /= zp.sum(-1, keepdims=True)
        # off-target AOIs are never scored by compute_probs (z = 0 forced)
        zp[N:] = eps
        zp[N:, ..., 0] = 1.0 - (S1 - 1) * eps

        # fresh parameter state, then overwrite from the cosmos fit. All
        # the mapping math runs in NUMPY: under a remote-device transport
        # every eager jnp op is a separate program dispatch, and the dozen
        # transform inverses below cost minutes of AOT round-trips if
        # traced (observed on the axon tunnel); the transforms' inverses
        # are simple closed forms (log / logit / normalized log).
        self.init_parameters()
        params = dict(self.params)

        for name in params:
            if name in cm.params and np.shape(cm.params[name]) == np.shape(
                params[name]
            ):
                params[name] = jnp.asarray(cm.params[name], self.dtype)

        def dev(x):
            return jnp.asarray(np.asarray(x, np.float32), self.dtype)

        # q(m | z): cosmos q(m) (K, Nt, F, Q), broadcast over z; logit
        qm = np.clip(np.asarray(cm.param("m_probs"), np.float64), 1e-3,
                     1.0 - 1e-3)
        qm_full = np.broadcast_to(qm, (S1,) + qm.shape)
        params["m_probs"] = dev(np.log(qm_full) - np.log1p(-qm_full))

        # chain guide: rows = cosmos marginals (prefix products reproduce
        # the cosmos posterior exactly at step 0); simplex inverse = log of
        # normalized probs
        zt = np.broadcast_to(
            zp[:, :, :, None, :], (Nt, F, C, S1, S1)
        )
        params["z_trans"] = dev(np.log(zt))  # rows already normalized

        # chain prior: empirical start + expected transition counts of the
        # cosmos posterior (on-target AOIs only), lightly smoothed
        on = zp[:N]  # (N, F, Q, S1)
        init_mean = on[:, 0].mean(0).reshape(self.Q, S1)  # (Q, S1)
        init_mean = np.clip(init_mean, 1e-4, 1.0)
        init_mean /= init_mean.sum(-1, keepdims=True)
        # T[q, i, j] ∝ sum_{n, f} q(z_{f-1} = i) q(z_f = j) + 1 pseudo-count
        T = np.einsum("nfqi,nfqj->qij", on[:, :-1], on[:, 1:]) + 1.0
        T /= T.sum(-1, keepdims=True)
        params["init_mean"] = dev(np.log(init_mean))
        params["trans_mean"] = dev(np.log(T))
        params["trans_size"] = dev(
            np.log(np.full((self.Q, S1, 1), 10.0))
        )

        self.params = params
        self.iter = 0
        self.converged = False
        self._rolling = {}
        self.opt_state = self._init_opt_state()
        self._key = jax.random.PRNGKey(0)
        for cache in ("_z_probs_cache", "_theta_probs_cache", "_probs_cache"):
            if hasattr(self, cache):
                delattr(self, cache)
        logger_name = __name__
        import logging as _logging

        _logging.getLogger(logger_name).info(
            "Warm-started cosmos+hmm from the cosmos fit at "
            f"{run_path / 'cosmos_model.tpqr'} "
            f"(trans estimate: {np.round(T, 4).tolist()})"
        )
        return self
