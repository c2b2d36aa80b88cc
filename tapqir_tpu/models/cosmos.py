"""cosmos: multi-color time-independent colocalization model.

TPU-native re-design of the reference model (tapqir/models/cosmos.py:28-784).
The generative model and mean-field guide are identical in distributional
form; the difference is architectural: instead of Pyro plates + TraceEnum
effect handlers, the ELBO below marginalizes the discrete latents
(z in {0..S}, theta in {0..K}, m in {0,1}^K - 12 joint configurations at the
defaults) with explicit dense tables and logsumexp, entirely inside one
jit-compiled function. Subsampled-plate scaling (Nt/nbatch * F/fbatch)
reproduces Pyro's plate gradient scaling.

Generative model (reference: cosmos.py:82-327):

    gain ~ HalfNormal(gain_std)
    pi ~ Dirichlet(1/(1+S)); lamda ~ Exponential(lamda_rate)
    proximity ~ Exponential(proximity_rate)
    per AOI:  background_mean, background_std ~ HalfNormal
    per (AOI, frame, channel):
        background ~ Gamma((bm/bs)^2, bm/bs^2)
        z ~ Categorical(expand_offtarget(pi))    [off-target forced z=0]
        theta ~ Categorical(probs_theta(z))
        per spot k: m_k ~ Bernoulli(probs_m(lamda)[theta, k])
            height ~ HalfNormal(height_std); width ~ AffineBeta(1.5, 2, ...)
            x, y ~ AffineBeta(0, size(proximity, theta==k+1), +-(P+1)/2)
        D ~ KSMOGN(...)

Guide (reference: cosmos.py:329-462): mean-field with Delta(background_mean/
std), Gamma(background, height), AffineBeta(width, x, y, proximity),
Dirichlet(pi), Gamma(gain, lamda), and enumerated Bernoulli(m).
"""

import math
from functools import partial

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
from tapqir_tpu.distributions.ksmogn import (
    offset_gamma_factored_summed,
    offset_gamma_log_prob_summed,
)
from tapqir_tpu.distributions.util import gaussian_spots_flat
from tapqir_tpu.infer.discrete import (
    log_probs_m,
    log_probs_theta,
    log_probs_z,
    m_configs,
)
from tapqir_tpu.models.model import Model

DEFAULT_PRIORS = {
    "background_mean_std": 1000.0,
    "background_std_std": 100.0,
    "lamda_rate": 1.0,
    "height_std": 10000.0,
    "width_min": 0.75,
    "width_max": 2.25,
    "proximity_rate": 1.0,
    "gain_std": 50.0,
}


class cosmos(Model):
    r"""Multi-Color Time-Independent Colocalization Model.

    Reference: Ordabayev YA, Friedman LJ, Gelles J, Theobald DL. Bayesian
    machine learning analysis of single-molecule fluorescence colocalization
    images. eLife. 2022. doi: 10.7554/eLife.73860.
    """

    name = "cosmos"

    def __init__(self, S=1, K=2, Q=None, device=None, dtype="float32",
                 use_pallas=None, priors=None, vectorized=True):
        merged = dict(DEFAULT_PRIORS)
        merged.update(priors or {})
        super().__init__(
            S=S, K=K, Q=Q, device=device, dtype=dtype,
            use_pallas=use_pallas, priors=merged, vectorized=vectorized,
        )
        self._global_params = ["gain", "proximity", "lamda", "pi"]
        self.conv_params = ["-ELBO", "proximity_loc", "gain_loc", "lamda_loc"]
        self.ci_params = [
            "gain", "pi", "lamda", "proximity",
            "background", "height", "width", "x", "y",
        ]

    # -- variational parameters (reference: cosmos.py:464-598) ---------------
    def param_spec(self):
        data = self.data
        K, Q, S = self.K, self.Q, self.S
        Nt, F, C, P = data.Nt, data.F, data.C, data.P
        eps = float(np.finfo(np.float32).eps)
        lim = (P + 1) / 2
        wmin, wmax = self.priors["width_min"], self.priors["width_max"]
        # median minus offset baseline (reference: cosmos.py:530-548);
        # floored at 1 so degenerate datasets (median <= offset mean) do not
        # produce a non-positive init for a positive-constrained parameter
        bg0 = np.maximum(data.median - data.offset.mean, 1.0)
        bg_init = np.broadcast_to(bg0[None, None, :], (Nt, 1, C))
        b_init = np.broadcast_to(bg0[None, None, :], (Nt, F, C))
        spec = {
            "pi_mean": (np.ones((Q, S + 1)) / (S + 1), constraints.simplex()),
            "pi_size": (np.full((Q, 1), 2.0), constraints.positive()),
            "m_probs": (np.full((K, Nt, F, Q), 0.5), constraints.unit_interval()),
            "proximity_loc": (
                np.array(0.5),
                constraints.interval(0.0, (P + 1) / math.sqrt(12) - eps),
            ),
            "proximity_size": (np.array(100.0), constraints.greater_than(2.0)),
            "lamda_loc": (np.full((Q,), 0.5), constraints.positive()),
            "lamda_beta": (np.full((Q,), 100.0), constraints.positive()),
            "gain_loc": (np.array(5.0), constraints.positive()),
            "gain_beta": (np.array(100.0), constraints.positive()),
            "background_mean_loc": (bg_init, constraints.positive()),
            "background_std_loc": (np.ones((Nt, 1, C)), constraints.positive()),
            "b_loc": (b_init, constraints.positive()),
            "b_beta": (np.ones((Nt, F, C)), constraints.positive()),
            "h_loc": (np.full((K, Nt, F, Q), 2000.0), constraints.positive()),
            "h_beta": (np.full((K, Nt, F, Q), 0.001), constraints.positive()),
            "w_mean": (
                np.full((K, Nt, F, Q), 1.5),
                constraints.interval(wmin + eps, wmax - eps),
            ),
            "w_size": (np.full((K, Nt, F, Q), 100.0), constraints.greater_than(2.0)),
            "x_mean": (
                np.zeros((K, Nt, F, Q)),
                constraints.interval(-lim + eps, lim - eps),
            ),
            "y_mean": (
                np.zeros((K, Nt, F, Q)),
                constraints.interval(-lim + eps, lim - eps),
            ),
            "size": (np.full((K, Nt, F, Q), 200.0), constraints.greater_than(2.0)),
        }
        return spec

    def param_partition(self):
        """PartitionSpec per variational parameter for the ("aoi", "frame")
        mesh: per-AOI/per-frame parameters shard with the data, globals
        replicate (SURVEY.md section 5.8)."""
        from jax.sharding import PartitionSpec as P

        spec = {}
        for name in self._transforms:
            if name in ("b_loc", "b_beta"):  # (Nt, F, C)
                spec[name] = P("aoi", "frame", None)
            elif name in ("background_mean_loc", "background_std_loc"):  # (Nt, 1, C)
                spec[name] = P("aoi", None, None)
            elif name in (
                "m_probs", "h_loc", "h_beta", "w_mean", "w_size",
                "x_mean", "y_mean", "size",
            ):  # (K, Nt, F, Q)
                spec[name] = P(None, "aoi", "frame", None)
            else:  # global scalars/vectors
                spec[name] = P()
        return spec

    # -- ELBO -----------------------------------------------------------------
    def _draw_batch(self, key, data, key_ndx=None):
        """Subsampling draws + per-section keys, shared by :meth:`elbo` and
        the window-space optimizer step (models/model.py:_build_step).

        ``frame_sampling="random"`` draws an independent uniform frame
        subset per step (sorted for monotonic gathers) — the reference's
        scheme (tapqir/models/cosmos.py:202-207); ``"window"`` draws a
        cyclic contiguous window at a random offset. Both are unbiased
        (uniform per-frame inclusion probability f/F).

        ``key_ndx``, when given, replaces the AOI-draw key — the sharded
        step passes a key shared by every frame shard of a mesh row so all
        of them gather the same AOI rows in the same order (required for
        the frame-axis gradient reduction of AOI-replicated parameters;
        see parallel/sharding.py)."""
        Nt, F = data["xy"].shape[0], data["xy"].shape[1]
        n = min(self.nbatch_size, Nt)
        f = min(self.fbatch_size, F)
        k_n, k_f, k_global, k_local = jax.random.split(key, 4)
        if key_ndx is not None:
            k_n = key_ndx
        ndx = jax.random.permutation(k_n, Nt)[:n]
        if getattr(self, "frame_sampling", "window") == "random" and f < F:
            fsel = jnp.sort(jax.random.permutation(k_f, F)[:f])
        else:
            fsel = jax.random.randint(k_f, (), 0, F)
        return ndx, fsel, f, k_global, k_local

    def elbo(self, params_u, key, data, n_shards=1, frame_shards=1,
             key_ndx=None, return_batch=False):
        """Minibatch ELBO from UNCONSTRAINED parameters. ``data`` arrays may
        be a local shard (inside shard_map); sizes are taken from the arrays
        themselves. With ``n_shards > 1`` the global term is divided so that
        the psum over shards counts it once; ``frame_shards`` likewise divides
        the per-AOI prior term, which every frame shard of an AOI row
        otherwise contributes identically. ``return_batch=True`` also returns
        the subsampled rows ``(ndx, fidx)`` so callers can restrict work to
        exactly the parameters in this step's trace.

        Constraint transforms are applied AFTER the batch gather (they are
        elementwise, so transform-then-gather == gather-then-transform) -
        transforming the full (K, Nt, F, Q) arrays every step would cost
        ~12M transcendentals + HBM round-trips at production scale."""
        ndx, f0, f, k_global, k_local = self._draw_batch(key, data, key_ndx)
        win = self.gather_windows(params_u, ndx, f0, f)
        value = self.elbo_from_windows(
            win, k_global, k_local, ndx, f0, f, data,
            n_shards=n_shards, frame_shards=frame_shards,
        )
        if return_batch:
            F = data["xy"].shape[1]
            fidx = f0 if jnp.ndim(f0) else (f0 + jnp.arange(f)) % F
            return value, (ndx, fidx)
        return value

    def elbo_from_windows(self, win, k_global, k_local, ndx, f0, f_b, data,
                          n_shards=1, frame_shards=1):
        """ELBO from pre-gathered parameter windows (see
        :meth:`Model.gather_windows`). The optimizer step differentiates
        THIS function so gradients are window-shaped - no full-size
        scatter-add gradient arrays."""
        Nt, F = data["xy"].shape[0], data["xy"].shape[1]
        n = ndx.shape[0]
        scale = (Nt / n) * (F / f_b)
        scale_n = Nt / n
        local, aoi_term, global_term = self._elbo_terms(
            win, k_global, k_local, ndx, f0, f_b, data
        )
        return (
            global_term / n_shards
            + aoi_term * scale_n / frame_shards
            + local * scale
        )

    def _elbo_terms(self, win, key_global, key_local, ndx, f0, f_b, data):
        """Returns (sum of local per-(n,f,c) terms, sum of per-AOI terms,
        global term) for the given batch. ``key_global`` drives the
        global-parameter samples; ``key_local`` drives the per-batch samples.
        ``win`` holds UNCONSTRAINED parameter windows pre-gathered by
        :meth:`Model.gather_windows`.

        Frame batching uses a cyclic contiguous window of ``f_b`` frames
        starting at random offset ``f0`` (uniform inclusion probability, so
        the subsampled-plate estimator stays unbiased). The (AOI-gather,
        frame-window) pair for the DATA arrays is ONE flat row gather with
        precomputed indices ``ndx * F + (f0 + arange(f_b)) % F`` on a
        (Nt*F, ...) view: giving the big image array a second in-step
        consumer (a dynamic-slice window after the row gather, or a
        concat+slice) makes XLA assign it two layouts and relayout-copy the
        full stack every step (8.7 ms at eLife scale, profiled); the
        single-gather form costs ~0."""
        S, K, Q = self.S, self.K, self.Q
        P = self.data.P
        dtype = self.dtype
        priors = self.priors
        lim = (P + 1) / 2
        wmin, wmax = priors["width_min"], priors["width_max"]
        prox_high = (P + 1) / math.sqrt(12)

        tf = self._transforms
        F_l = data["xy"].shape[1]
        n_b = ndx.shape[0]
        if f_b == F_l:
            flat_ndx = (
                ndx[:, None] * F_l + jnp.arange(F_l)[None, :]
            ).reshape(-1)
        else:
            fidx = f0 if jnp.ndim(f0) else (f0 + jnp.arange(f_b)) % F_l
            flat_ndx = (ndx[:, None] * F_l + fidx[None, :]).reshape(-1)

        def g2a(arr):  # raw DATA (Nt, F, ...) -> (n, f, ...)
            flat = arr.reshape((arr.shape[0] * arr.shape[1],) + arr.shape[2:])
            sub = jnp.take(flat, flat_ndx, 0)
            return sub.reshape((n_b, f_b) + arr.shape[2:])

        # parameter windows are pre-gathered (constrain-after-gather: the
        # transforms are elementwise, so they commute with the gather)
        def pc(name):  # global parameter -> constrained
            return tf[name](win[name])

        def g2(name):  # window (n, f, C), constrained
            return tf[name](win[name])

        def gk(name):  # window (K, n, f, Q) -> (n, f, Q, K), constrained
            return tf[name](jnp.moveaxis(win[name], 0, -1))

        # images live flat-lane-padded on device: (Nt, F, C, EVP)
        obs = g2a(data["images"])  # (n, f, C, EVP)
        target_locs = g2a(data["xy"])  # (n, f, C, 2)
        ont = jnp.take(data["is_ontarget"], ndx)  # (n,)
        mask = jnp.take(data["mask"], ndx)  # (n,)

        # ---- local continuous guide params (gathered windows) -----------------
        b_loc, b_beta = g2("b_loc"), g2("b_beta")
        h_loc, h_beta = gk("h_loc"), gk("h_beta")  # (n, f, Q, K)
        w_mean, w_size = gk("w_mean"), gk("w_size")
        x_mean, y_mean = gk("x_mean"), gk("y_mean")
        size = gk("size")
        qm = gk("m_probs")

        # ---- ALL guide-site draws in two packed std-gamma calls ----------------
        gain, pi, lamda, prox, b, h, w, xs, ys, extras = self._sample_sites(
            key_global, key_local, pc, b_loc, b_beta, h_loc, h_beta,
            w_mean, w_size, x_mean, y_mean, size,
        )
        gain_conc = pc("gain_loc") * pc("gain_beta")
        pi_conc = pc("pi_mean") * pc("pi_size")
        lamda_conc = pc("lamda_loc") * pc("lamda_beta")

        global_term = (
            halfnormal_log_prob(gain, priors["gain_std"])
            - gamma_log_prob(gain, gain_conc, pc("gain_beta"))
            + (
                dirichlet_log_prob(pi, jnp.full((Q, S + 1), 1.0 / (S + 1), dtype))
                - dirichlet_log_prob(pi, pi_conc)
            ).sum()
            + (
                exponential_log_prob(lamda, priors["lamda_rate"])
                - gamma_log_prob(lamda, lamda_conc, pc("lamda_beta"))
            ).sum()
            + exponential_log_prob(prox, priors["proximity_rate"])
            - affine_beta_log_prob(
                prox, pc("proximity_loc"), pc("proximity_size"), 0.0, prox_high
            )
        )
        global_term = self._extra_global_terms(pc, extras, global_term)  # pc is the getter fn

        # ---- per-AOI Delta sites (MAP background hyper-params) -------------------
        bm = tf["background_mean_loc"](win["background_mean_loc"])[:, 0, :]  # (n, C)
        bs = tf["background_std_loc"](win["background_std_loc"])[:, 0, :]
        aoi_term = (
            (
                halfnormal_log_prob(bm, priors["background_mean_std"])
                + halfnormal_log_prob(bs, priors["background_std_std"])
            )
            * mask[:, None]
        ).sum()

        # ---- local continuous log-probs ---------------------------------------
        lp_b = gamma_log_prob(
            b, (bm / bs)[:, None, :] ** 2, (bm / bs**2)[:, None, :]
        )
        lq_b = gamma_log_prob(b, b_loc * b_beta, b_beta)

        local = self._local_marginalized(
            pc, obs, target_locs, ont, gain, pi, lamda, prox, b,
            h, w, xs, ys, qm,
            h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size,
            data,
        )
        local_sum = ((local + lp_b - lq_b) * mask[:, None, None]).sum()
        return local_sum, aoi_term, global_term

    def _extra_global_concs(self, pc):
        """Extra global Dirichlet sites to fold into the packed global draw
        (crosstalk overrides with alpha). Returns (names, conc arrays with
        the event axis last)."""
        return [], []

    def _sample_sites(
        self, key_global, key_local, pc, b_loc, b_beta, h_loc, h_beta,
        w_mean, w_size, x_mean, y_mean, size,
    ):
        """All guide-site draws in ONE packed std-gamma call.

        Per-site sampler calls each pay a ``random_gamma_grad``
        while-loop pair in the backward (~0.9 ms/step combined at eLife
        scale, profiled round 4), and even a separate 6-element pack for
        just the global sites costs ~0.45 ms/step of latency-bound
        serialized iterations; riding the global elements along the big
        local pack makes them free. ``key_local`` keys the merged draw
        (``key_global`` is retained in the signature for the restart/shard
        key-plumbing and the oracle). The estimator parity oracle
        (tests/test_estimator_parity.py) draws its samples through THIS
        method, then scores them with independent math.
        """
        del key_global  # merged draw (see docstring)
        P = self.data.P
        lim = (P + 1) / 2
        wmin, wmax = self.priors["width_min"], self.priors["width_max"]
        prox_high = (P + 1) / math.sqrt(12)

        gain_conc = pc("gain_loc") * pc("gain_beta")
        pi_conc = pc("pi_mean") * pc("pi_size")
        lamda_conc = pc("lamda_loc") * pc("lamda_beta")
        pg1, pg0 = affine_beta_concentrations(
            pc("proximity_loc"), pc("proximity_size"), 0.0, prox_high
        )
        extra_names, extra_concs = self._extra_global_concs(pc)
        wc1, wc0 = affine_beta_concentrations(w_mean, w_size, wmin, wmax)
        xc1, xc0 = affine_beta_concentrations(x_mean, size, -lim, lim)
        yc1, yc0 = affine_beta_concentrations(y_mean, size, -lim, lim)
        g = std_gamma_sample_packed(
            key_local,
            [
                jnp.reshape(gain_conc, (1,)),
                lamda_conc,
                jnp.reshape(pi_conc, (-1,)),
                jnp.reshape(pg1, (1,)),
                jnp.reshape(pg0, (1,)),
            ]
            + list(extra_concs)
            + [b_loc * b_beta, h_loc * h_beta, wc1, xc1, yc1, wc0, xc0, yc0],
        )
        n_extra = len(extra_names)
        gain = g[0][0] / pc("gain_beta")
        lamda = g[1] / pc("lamda_beta")
        pi = dirichlet_from_gammas(jnp.reshape(g[2], jnp.shape(pi_conc)))
        prox = prox_high * beta_from_gamma_pair(g[3][0], g[4][0])
        extras = {
            nm: dirichlet_from_gammas(gg)
            for nm, gg in zip(extra_names, g[5:5 + n_extra])
        }
        gb, gh, gw1, gx1, gy1, gw0, gx0, gy0 = g[5 + n_extra:]
        b = gb / b_beta
        h = gh / h_beta
        w = wmin + (wmax - wmin) * beta_from_gamma_pair(gw1, gw0)
        xs = -lim + 2 * lim * beta_from_gamma_pair(gx1, gx0)
        ys = -lim + 2 * lim * beta_from_gamma_pair(gy1, gy0)
        return gain, pi, lamda, prox, b, h, w, xs, ys, extras

    def _extra_global_terms(self, pc, extras, global_term):
        """Hook for subclasses (crosstalk alpha); ``extras`` holds the
        packed-draw samples declared by :meth:`_extra_global_concs`."""
        return global_term

    def _dye_tables(
        self, ont, pi, lamda, prox, h, w, xs, ys, qm,
        h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size,
    ):
        """Per-dye discrete tables, each (M=2^K, n, f, Q):

        * inner    - logsumexp over (z, theta) of the model's discrete joint
        * term_hw  - sum_k m_k (log p(h_k) + log p(w_k))
        * log_qm   - log q(m-config)
        * term_q   - sum_k m_k log q(h, w, x, y)

        The per-(z, theta, m) structure factorizes across dyes (each dye has
        its own z_q/theta_q/m_q), so crosstalk reuses these tables and only
        the image likelihood couples dyes.
        """
        S, K = self.S, self.K
        P = self.data.P
        dtype = self.dtype
        priors = self.priors
        lim = (P + 1) / 2
        wmin, wmax = priors["width_min"], priors["width_max"]

        mtab = jnp.asarray(m_configs(K), dtype)  # (M, K)

        # discrete tables
        lpz = log_probs_z(pi, ont)  # (n, Q, 1+S)
        lpt = log_probs_theta(K, S, dtype)  # (1+S, 1+K)
        lpm1, lpm0 = log_probs_m(lamda, K)  # (Q, 1+K, K)
        log_pm_sum = jnp.einsum("mk,qtk->mtq", mtab, lpm1) + jnp.einsum(
            "mk,qtk->mtq", 1.0 - mtab, lpm0
        )  # (M, 1+K, Q)

        # x/y priors under non-specific (size=2) and specific (size from proximity)
        size_sp = ((P + 1) / (2 * prox)) ** 2 - 1.0
        lpxy_ns = affine_beta_log_prob(xs, 0.0, 2.0, -lim, lim) + affine_beta_log_prob(
            ys, 0.0, 2.0, -lim, lim
        )  # (n, f, Q, K)
        lpxy_sp = affine_beta_log_prob(
            xs, 0.0, size_sp, -lim, lim
        ) + affine_beta_log_prob(ys, 0.0, size_sp, -lim, lim)
        spec_tk = jnp.asarray(
            np.arange(1 + K)[:, None] == 1 + np.arange(K), bool
        )  # (1+K, K)
        lpxy_t = jnp.where(
            spec_tk[:, None, None, None, :], lpxy_sp[None], lpxy_ns[None]
        )  # (1+K, n, f, Q, K)
        term_xy = jnp.einsum("mk,tnfqk->mtnfq", mtab, lpxy_t)  # (M, 1+K, n, f, Q)

        # joint table over (m-config, z, theta) -> logsumexp over z, theta
        T_full = (
            lpz.transpose(2, 0, 1)[None, :, None, :, None, :]  # (1, Z, 1, n, 1, Q)
            + lpt[None, :, :, None, None, None]  # (1, Z, T, 1, 1, 1)
            + log_pm_sum[:, None, :, None, None, :]  # (M, 1, T, 1, 1, Q)
            + term_xy[:, None]  # (M, 1, T, n, f, Q)
        )
        inner = logsumexp(T_full, axis=(1, 2))  # (M, n, f, Q)

        # spot priors that do not depend on (z, theta)
        lph = halfnormal_log_prob(h, priors["height_std"])
        lpw = affine_beta_log_prob(w, 1.5, 2.0, wmin, wmax)
        term_hw = jnp.einsum("mk,nfqk->mnfq", mtab, lph + lpw)

        # guide terms
        log_qm = jnp.einsum("mk,nfqk->mnfq", mtab, jnp.log(qm)) + jnp.einsum(
            "mk,nfqk->mnfq", 1.0 - mtab, jnp.log1p(-qm)
        )  # (M, n, f, Q)
        lqh = gamma_log_prob(h, h_loc * h_beta, h_beta)
        lqw = affine_beta_log_prob(w, w_mean, w_size, wmin, wmax)
        lqx = affine_beta_log_prob(xs, x_mean, size, -lim, lim)
        lqy = affine_beta_log_prob(ys, y_mean, size, -lim, lim)
        term_q = jnp.einsum("mk,nfqk->mnfq", mtab, lqh + lqw + lqx + lqy)

        return inner, term_hw, log_qm, term_q

    def _local_marginalized(
        self, pc, obs, target_locs, ont, gain, pi, lamda, prox, b,
        h, w, xs, ys, qm,
        h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size, data,
    ):
        """E_q(m)[ log-marginal over (z, theta) + spot priors + likelihood
        - guide terms ], per (n, f, c). All spot tensors are (n, f, Q, K)."""
        K, P = self.K, self.data.P
        dtype = self.dtype
        mtab = jnp.asarray(m_configs(K), dtype)

        inner, term_hw, log_qm, term_q = self._dye_tables(
            ont, pi, lamda, prox, h, w, xs, ys, qm,
            h_loc, h_beta, w_mean, w_size, x_mean, y_mean, size,
        )
        wq = jnp.exp(log_qm)

        # likelihood per m-config (Q == C for cosmos), in the lane-padded
        # flat pixel layout end-to-end (dense einsum + summed kernel by
        # default; use_factored=True assembles configs inside the factored
        # kernel — see _likelihood / docs/kernel_analysis.md)
        ev_pad = obs.shape[-1]
        loglik = self._likelihood(
            obs, b, h, w, xs, ys, target_locs, gain, data, ev_pad
        )

        return (wq * (inner + term_hw + loglik - log_qm - term_q)).sum(0)  # (n, f, Q)

    @staticmethod
    def _spots_kernel_layout(h, w, xs, ys, target_locs, P, ev_pad):
        """Rendered spots in the kernel's (K, n, f, C, EVP) layout.

        The spot-major layout is produced DIRECTLY by transposing the tiny
        (n, f, Q, K) parameter tensors before the render, so the 10s-of-MB
        rendered tensor is never relayout-copied (transposing it after the
        fact costs ~2x its size in HBM traffic per step)."""

        def tr(a):  # (n, f, Q, K) -> (K, n, f, Q, 1)
            return jnp.moveaxis(a, -1, 0)[..., None]

        g = gaussian_spots_flat(
            tr(h), tr(w), tr(xs), tr(ys), target_locs[None], P, ev_pad
        )  # (K, n, f, C, 1, EVP)
        return g[..., 0, :]

    def _likelihood(self, obs, b, h, w, xs, ys, target_locs, gain, data,
                    ev_pad):
        """(M, n, f, C) event-summed KSMOGN log-likelihood.

        Default: the round-4-proven dense path — spots rendered spot-LAST
        (n, f, C, K, EVP), the (M, batch, EVP) concentration built by an
        XLA einsum, event reduction inside the dense summed Pallas kernel.

        ``use_factored=True``: spots rendered spot-MAJOR (tiny-parameter
        transpose before the render) and configs assembled INSIDE the
        factored kernel (1 + K exps per pixel-offset). Measured SLOWER on
        v5e despite the exp savings (kernel-only A/B in
        scripts/bench_kernel_only.py; op accounting in
        docs/kernel_analysis.md) — kept as a tested alternative."""
        n_, f_, C_ = obs.shape[:3]
        K = self.K
        P = self.data.P
        mtab_np = m_configs(K)  # static (M, K)
        nfc = n_ * f_ * C_
        if getattr(self, "use_factored", False):
            spots = self._spots_kernel_layout(
                h, w, xs, ys, target_locs, P, ev_pad
            )  # (K, n, f, C, EVP)
            out = offset_gamma_factored_summed(
                obs.reshape(nfc, ev_pad),
                b.reshape(-1) / gain,
                spots.reshape(K, nfc, ev_pad) / gain,
                mtab_np, 1.0 / gain,
                data["offset_samples"], data["offset_logits"],
                ev=P * P, use_pallas=self.use_pallas,
            )
        else:
            gauss = gaussian_spots_flat(
                h, w, xs, ys, target_locs, P, ev_pad
            )  # (n, f, C, K, EVP)
            gauss_flat = gauss.reshape(nfc, K, ev_pad)
            img_flat = b.reshape(-1)[None, :, None] + jnp.einsum(
                "mk,xkp->mxp", jnp.asarray(mtab_np, gauss.dtype), gauss_flat
            )  # (M, nfc, EVP)
            out = offset_gamma_log_prob_summed(
                obs.reshape(nfc, ev_pad), img_flat / gain, 1.0 / gain,
                data["offset_samples"], data["offset_logits"],
                event_ndims=1, use_pallas=self.use_pallas, ev=P * P,
            )
        return out.reshape(mtab_np.shape[0], n_, f_, C_)  # (M, n, f, C)

    # -- posterior probabilities (reference: cosmos.py:609-672) ----------------
    def _probs_batch(self, pc, key, ndx, fdx, data, num_particles):
        """z/theta posterior marginals for one (AOI, frame) block, averaged
        over ``num_particles`` guide samples."""
        S, K, Q = self.S, self.K, self.Q
        P = self.data.P
        dtype = self.dtype
        lim = (P + 1) / 2
        prox_high = (P + 1) / math.sqrt(12)

        def gk(a):
            return jnp.moveaxis(jnp.take(jnp.take(a, ndx, 1), fdx, 2), 0, -1)

        ont = jnp.take(data["is_ontarget"], ndx)
        x_mean, y_mean, size = gk(pc["x_mean"]), gk(pc["y_mean"]), gk(pc["size"])
        qm = gk(pc["m_probs"])
        mtab = jnp.asarray(m_configs(K), dtype)
        lpt = log_probs_theta(K, S, dtype)

        def one_particle(k):
            ks = jax.random.split(k, 5)
            pi = dirichlet_sample(ks[0], pc["pi_mean"] * pc["pi_size"])
            lamda = gamma_sample(
                ks[1], pc["lamda_loc"] * pc["lamda_beta"], pc["lamda_beta"]
            )
            prox = affine_beta_sample(
                ks[2], pc["proximity_loc"], pc["proximity_size"], 0.0, prox_high
            )
            xs = affine_beta_sample(ks[3], x_mean, size, -lim, lim)
            ys = affine_beta_sample(ks[4], y_mean, size, -lim, lim)

            lpz = log_probs_z(pi, ont)
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

            T_full = (
                lpz.transpose(2, 0, 1)[None, :, None, :, None, :]
                + lpt[None, :, :, None, None, None]
                + log_pm_sum[:, None, :, None, None, :]
                + term_xy[:, None]
            )  # (M, Z, T, n, f, Q)
            # p(z, theta | m, phi), then expectation over q(m)
            log_qm = jnp.einsum("mk,nfqk->mnfq", mtab, jnp.log(qm)) + jnp.einsum(
                "mk,nfqk->mnfq", 1.0 - mtab, jnp.log1p(-qm)
            )
            T_norm = T_full - logsumexp(T_full, axis=(1, 2), keepdims=True)
            r = logsumexp(
                T_norm + log_qm[:, None, None], axis=0
            )  # (Z, T, n, f, Q)
            z_p = jnp.exp(logsumexp(r, axis=1))  # (Z, n, f, Q)
            th_p = jnp.exp(logsumexp(r, axis=0))[1:]  # (K, n, f, Q)
            return z_p, th_p

        keys = jax.random.split(key, num_particles)
        z_p, th_p = jax.vmap(one_particle)(keys)
        return z_p.mean(0), th_p.mean(0)

    def compute_probs_arrays(self, num_particles=50, key=None):
        """Full-dataset z_probs (Nt, F, Q, 1+S) and theta_probs (K, Nt, F, Q).

        Like the reference (cosmos.py:609-672), only on-target AOIs are
        evaluated (off-target rows stay zero) in (nbatch x fbatch) blocks.
        With an active mesh (:meth:`Model.use_mesh`) the blocks run
        shard-parallel via ``make_sharded_probs_fn`` instead.
        """
        if getattr(self, "_mesh", None) is not None:
            from tapqir_tpu.parallel.sharding import (
                make_sharded_probs_fn,
                shard_params_and_data,
            )

            params_sh, data_sh = shard_params_and_data(
                self._mesh, self.params, self.param_partition(),
                self._data_dev,
            )
            probs_fn = make_sharded_probs_fn(
                self, self._mesh, num_particles=num_particles
            )
            key = jax.random.PRNGKey(0) if key is None else key
            z_p, th_p = probs_fn(params_sh, key, data_sh)
            Nt = self.data.Nt  # slice mesh AOI padding (pad_for_mesh)
            return (
                np.asarray(z_p, np.float64)[:Nt],
                np.asarray(th_p, np.float64)[:, :Nt],
            )
        data = self._data_dev
        pc = self.constrained()
        key = jax.random.PRNGKey(0) if key is None else key
        Nt, F, Q = self.data.Nt, self.data.F, self.Q
        N = self.data.N
        nb, fb = self.nbatch_size, self.fbatch_size
        z_probs = np.zeros((Nt, F, Q, 1 + self.S), np.float64)
        theta_probs = np.zeros((self.K, Nt, F, Q), np.float64)

        fn = jax.jit(
            partial(self._probs_batch, num_particles=num_particles),
            static_argnames=(),
        )
        for n0 in range(0, N, nb):
            ndx_np = np.arange(n0, min(n0 + nb, N))
            for f0 in range(0, F, fb):
                fdx_np = np.arange(f0, min(f0 + fb, F))
                # pad to full block size for a single compiled shape
                ndx = np.pad(ndx_np, (0, nb - len(ndx_np)), mode="edge")
                fdx = np.pad(fdx_np, (0, fb - len(fdx_np)), mode="edge")
                key, sub = jax.random.split(key)
                z_p, th_p = fn(pc, sub, jnp.asarray(ndx), jnp.asarray(fdx), data)
                z_p = np.asarray(z_p, np.float64)  # (Z, n, f, Q)
                th_p = np.asarray(th_p, np.float64)  # (K, n, f, Q)
                z_probs[ndx_np[:, None], fdx_np, :, :] = z_p[
                    :, : len(ndx_np), : len(fdx_np)
                ].transpose(1, 2, 3, 0)
                theta_probs[:, ndx_np[:, None], fdx_np, :] = th_p[
                    :, : len(ndx_np), : len(fdx_np)
                ]
        return z_probs, theta_probs

    # -- posterior summaries (reference: cosmos.py:674-784) ---------------------
    @property
    def compute_probs(self):
        if not hasattr(self, "_probs_cache"):
            self._probs_cache = self.compute_probs_arrays()
        return self._probs_cache

    @property
    def z_probs(self):
        r"""Probability of a target-specific spot, p(z) of shape (Nt, F, Q, 1+S)."""
        return self.compute_probs[0]

    @property
    def theta_probs(self):
        r"""Posterior q(theta = k), shape (K, Nt, F, Q)."""
        return self.compute_probs[1]

    @property
    def m_probs(self):
        r"""Posterior spot presence q(m = 1), shape (K, Nt, F, Q)."""
        return self.param("m_probs")

    @property
    def pspecific(self):
        return self.z_probs

    @property
    def z_map(self):
        return np.argmax(self.z_probs, axis=-1)

    def z_sample(self, num_samples, key=None):
        """Sample z trajectories from the posterior marginals
        (reference: cosmos.py:706-709)."""
        key = jax.random.PRNGKey(11) if key is None else key
        probs = self.params_stats["z_probs"][: self.data.N]
        return np.asarray(
            jax.random.categorical(
                key, jnp.log(jnp.clip(jnp.asarray(probs), 1e-30, None)),
                shape=(num_samples,) + probs.shape[:-1],
            )
        )

    def compute_params(self, CI):
        """Credible intervals for ci_params from the fitted guide
        (reference: cosmos.py:711-784)."""
        from tapqir_tpu.utils.stats import ci_from_scipy

        P = self.data.P
        lim = (P + 1) / 2
        wmin, wmax = self.priors["width_min"], self.priors["width_max"]
        params = {}
        for param in self.ci_params:
            if param == "gain":
                params[param] = ci_from_scipy(
                    "gamma", CI,
                    concentration=self.param("gain_loc") * self.param("gain_beta"),
                    rate=self.param("gain_beta"),
                )
            elif param == "alpha":
                params[param] = ci_from_scipy(
                    "dirichlet", CI,
                    concentration=self.param("alpha_mean") * self.param("alpha_size"),
                )
            elif param == "pi":
                params[param] = ci_from_scipy(
                    "dirichlet", CI,
                    concentration=self.param("pi_mean") * self.param("pi_size"),
                )
            elif param == "init":
                params[param] = ci_from_scipy(
                    "dirichlet", CI,
                    concentration=self.param("init_mean") * self.param("init_size"),
                )
            elif param == "trans":
                params[param] = ci_from_scipy(
                    "dirichlet", CI,
                    concentration=self.param("trans_mean") * self.param("trans_size"),
                )
            elif param == "lamda":
                params[param] = ci_from_scipy(
                    "gamma", CI,
                    concentration=self.param("lamda_loc") * self.param("lamda_beta"),
                    rate=self.param("lamda_beta"),
                )
            elif param == "proximity":
                params[param] = ci_from_scipy(
                    "affine_beta", CI,
                    mean=self.param("proximity_loc"),
                    sample_size=self.param("proximity_size"),
                    low=0.0, high=(P + 1) / math.sqrt(12),
                )
            elif param == "background":
                params[param] = ci_from_scipy(
                    "gamma", CI,
                    concentration=self.param("b_loc") * self.param("b_beta"),
                    rate=self.param("b_beta"),
                )
            elif param == "height":
                params[param] = ci_from_scipy(
                    "gamma", CI,
                    concentration=self.param("h_loc") * self.param("h_beta"),
                    rate=self.param("h_beta"),
                )
            elif param == "width":
                params[param] = ci_from_scipy(
                    "affine_beta", CI,
                    mean=self.param("w_mean"), sample_size=self.param("w_size"),
                    low=wmin, high=wmax,
                )
            elif param == "x":
                params[param] = ci_from_scipy(
                    "affine_beta", CI,
                    mean=self.param("x_mean"), sample_size=self.param("size"),
                    low=-lim, high=lim,
                )
            elif param == "y":
                params[param] = ci_from_scipy(
                    "affine_beta", CI,
                    mean=self.param("y_mean"), sample_size=self.param("size"),
                    low=-lim, high=lim,
                )
        params["m_probs"] = self.m_probs
        params["z_probs"] = self.z_probs
        params["theta_probs"] = self.theta_probs
        params["z_map"] = self.z_map
        params["p_specific"] = params["theta_probs"].sum(0)
        return params
