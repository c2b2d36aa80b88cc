"""Golden-value tests for the distribution layer against scipy/reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from tapqir_tpu.distributions import core
from tapqir_tpu.distributions.util import (
    expand_offtarget,
    gaussian_spots,
    probs_m,
    probs_theta,
    truncated_poisson_probs,
)


@pytest.fixture(autouse=True)
def _x64():
    """Golden scipy comparisons at rtol 1e-6..1e-10 need float64 math; the
    conftest autouse fixture restores the flag after each test."""
    jax.config.update("jax_enable_x64", True)
    yield


def test_gamma_log_prob_matches_scipy():
    x = np.array([0.5, 2.0, 10.0, 300.0])
    conc = np.array([0.7, 3.0, 50.0, 200.0])
    rate = np.array([2.0, 0.5, 1.3, 0.01])
    got = core.gamma_log_prob(jnp.array(x), jnp.array(conc), jnp.array(rate))
    want = st.gamma.logpdf(x, conc, scale=1 / rate)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_halfnormal_log_prob_matches_scipy():
    x = np.array([0.1, 5.0, 40.0])
    scale = np.array([1.0, 10.0, 50.0])
    got = core.halfnormal_log_prob(jnp.array(x), jnp.array(scale))
    want = st.halfnorm.logpdf(x, scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_exponential_log_prob_matches_scipy():
    x = np.array([0.1, 1.0, 7.0])
    rate = np.array([1.0, 0.5, 2.0])
    got = core.exponential_log_prob(jnp.array(x), jnp.array(rate))
    want = st.expon.logpdf(x, scale=1 / rate)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_affine_beta_log_prob_matches_scipy():
    # AffineBeta(mean, size, low, high): Beta(c1, c0) scaled to [low, high]
    mean, size, low, high = 0.3, 12.0, -7.5, 7.5
    c1 = size * (mean - low) / (high - low)
    c0 = size * (high - mean) / (high - low)
    x = np.array([-5.0, 0.0, 3.3, 7.0])
    got = core.affine_beta_log_prob(jnp.array(x), mean, size, low, high)
    want = st.beta.logpdf(x, c1, c0, loc=low, scale=high - low)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)


def test_dirichlet_log_prob_matches_scipy():
    conc = np.array([2.0, 3.0, 0.5])
    x = np.array([0.2, 0.5, 0.3])
    got = core.dirichlet_log_prob(jnp.array(x), jnp.array(conc))
    want = st.dirichlet.logpdf(x, conc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_samplers_moments():
    key = jax.random.PRNGKey(0)
    n = 50_000
    ks = jax.random.split(key, 4)
    g = core.gamma_sample(ks[0], jnp.full((n,), 5.0), jnp.full((n,), 2.0))
    np.testing.assert_allclose(np.mean(np.asarray(g)), 2.5, rtol=0.02)
    h = core.halfnormal_sample(ks[1], jnp.full((n,), 3.0))
    np.testing.assert_allclose(np.mean(np.asarray(h)), 3.0 * np.sqrt(2 / np.pi), rtol=0.02)
    b = core.affine_beta_sample(ks[2], 0.25, 10.0, 0.0, 1.0, shape=(n,))
    np.testing.assert_allclose(np.mean(np.asarray(b)), 0.25, rtol=0.03)
    e = core.exponential_sample(ks[3], jnp.full((n,), 4.0))
    np.testing.assert_allclose(np.mean(np.asarray(e)), 0.25, rtol=0.03)


def test_gamma_sampler_is_reparameterized():
    # pathwise gradient of E[x] wrt concentration should be ~ 1/rate
    def mean_sample(conc):
        key = jax.random.PRNGKey(1)
        return core.gamma_sample(key, jnp.full((20000,), conc), 2.0).mean()

    g = jax.grad(mean_sample)(4.0)
    np.testing.assert_allclose(float(g), 0.5, rtol=0.05)


def test_std_gamma_sample_matches_scipy_distribution():
    """Fixed-unroll Marsaglia-Tsang sampler: KS goodness-of-fit against the
    scipy Gamma CDF across the concentration range the models use,
    including the a < 1 boost branch."""
    key = jax.random.PRNGKey(7)
    n = 40_000
    for i, a in enumerate([0.05, 0.5, 1.0, 2.5, 30.0, 500.0]):
        z = np.asarray(
            core.std_gamma_sample(jax.random.fold_in(key, i), jnp.full((n,), a))
        )
        assert (z > 0).all(), f"a={a}: non-positive samples"
        ks = st.kstest(z, "gamma", args=(a,))
        assert ks.pvalue > 1e-4, f"a={a}: KS p={ks.pvalue} stat={ks.statistic}"


def test_std_gamma_sample_gradient_matches_jax_random_gamma():
    """The implicit-reparameterization gradient must agree with
    jax.random.gamma's (both use lax.random_gamma_grad; E[dz/da] ~
    d E[z]/da = 1 for a standard Gamma)."""
    key = jax.random.PRNGKey(3)

    for a in (0.3, 1.5, 20.0):
        g_ours = jax.grad(
            lambda c: core.std_gamma_sample(key, jnp.full((20000,), c)).mean()
        )(a)
        np.testing.assert_allclose(float(g_ours), 1.0, rtol=0.08)


def test_samplers_compile_without_while_loops():
    """The whole point of the fixed-unroll sampler: per-step sampling is
    straight-line code - no rejection while_loop dispatch chains on TPU."""
    def draw(key, conc):
        a = core.std_gamma_sample(key, conc)
        b = core.beta_sample(jax.random.fold_in(key, 1), conc, conc + 1.0)
        d = core.dirichlet_sample(
            jax.random.fold_in(key, 2), jnp.stack([conc, conc + 1.0], -1)
        )
        return a.sum() + b.sum() + d.sum()

    jaxpr = jax.make_jaxpr(draw)(jax.random.PRNGKey(0), jnp.ones((64,)))
    assert "while" not in str(jaxpr), "sampler still contains a while_loop"


def test_truncated_poisson_probs():
    lam = jnp.array(0.5)
    K = 2
    got = np.asarray(truncated_poisson_probs(lam, K))
    p0 = np.exp(-0.5)
    p1 = 0.5 * np.exp(-0.5)
    want = np.array([p0, p1, 1 - p0 - p1])
    np.testing.assert_allclose(got, want, rtol=1e-7)
    assert np.isclose(got.sum(), 1.0)


def test_probs_m_structure():
    # reference semantics (tapqir/distributions/util.py:94-130)
    lam = jnp.array([0.5])
    K = 2
    got = np.asarray(probs_m(lam, K))  # (1, 1+K, K)
    assert got.shape == (1, 3, 2)
    # theta == k + 1 rows have probability 1 at their own spot
    assert got[0, 1, 0] == 1.0
    assert got[0, 2, 1] == 1.0
    # theta = 0: sum_{l=1..K} l*TP(l; lam, K)/K
    tp = np.asarray(truncated_poisson_probs(lam, K))[0]
    want0 = (1 * tp[1] + 2 * tp[2]) / 2
    np.testing.assert_allclose(got[0, 0, :], want0, rtol=1e-7)
    # other theta: based on K-1 truncation
    tp1 = np.asarray(truncated_poisson_probs(lam, K - 1))[0]
    want1 = 1 * tp1[1] / 1
    np.testing.assert_allclose(got[0, 1, 1], want1, rtol=1e-7)
    np.testing.assert_allclose(got[0, 2, 0], want1, rtol=1e-7)


def test_expand_offtarget():
    pi = jnp.array([[0.8, 0.2]])
    got = np.asarray(expand_offtarget(pi))  # (1, 2, 2)
    np.testing.assert_allclose(got[0, :, 0], [1.0, 0.0])  # off-target forced z=0
    np.testing.assert_allclose(got[0, :, 1], [0.8, 0.2])  # on-target keeps pi


def test_probs_theta():
    got = np.asarray(probs_theta(2))
    np.testing.assert_allclose(got, [[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]])


def test_gaussian_spots_mass_and_peak():
    # a single bright spot centered on the grid integrates to ~height
    P = 14
    h = jnp.array([[1000.0]])
    w = jnp.array([[1.4]])
    x = jnp.array([[0.0]])
    y = jnp.array([[0.0]])
    target = jnp.array([(P - 1) / 2, (P - 1) / 2])
    img = gaussian_spots(h, w, x, y, target, P)  # (1, 1, P, P)
    assert img.shape == (1, 1, P, P)
    total = float(img.sum())
    np.testing.assert_allclose(total, 1000.0, rtol=1e-3)
    # peak at the center pixel
    peak = np.unravel_index(np.argmax(np.asarray(img)[0, 0]), (P, P))
    assert peak == ((P - 1) // 2, (P - 1) // 2) or peak == (P // 2, P // 2)


def test_gaussian_spots_xy_convention():
    # moving x shifts the spot along columns (reference meshgrid indexing="xy",
    # tapqir/distributions/util.py:44-48)
    P = 14
    h = jnp.array([1000.0])
    w = jnp.array([1.0])
    target = jnp.array([(P - 1) / 2, (P - 1) / 2])
    img_dx = gaussian_spots(h, w, jnp.array([3.0]), jnp.array([0.0]), target, P)[0]
    r, c = np.unravel_index(np.argmax(np.asarray(img_dx)), (P, P))
    assert c > r  # shifted along columns only
    img_dy = gaussian_spots(h, w, jnp.array([0.0]), jnp.array([3.0]), target, P)[0]
    r2, c2 = np.unravel_index(np.argmax(np.asarray(img_dy)), (P, P))
    assert r2 > c2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_offset_gamma_log_prob_matches_manual(dtype):
    from tapqir_tpu.distributions.ksmogn import offset_gamma_log_prob

    rng = np.random.default_rng(0)
    J = 7
    offsets = np.sort(rng.integers(80, 100, size=J)).astype(np.float64)
    logits = np.log(rng.dirichlet(np.ones(J)))
    value = rng.integers(120, 400, size=(5, 6)).astype(np.float64)
    conc = rng.uniform(10, 60, size=(5, 6))
    gain = 7.0

    got = offset_gamma_log_prob(
        jnp.asarray(value, dtype),
        jnp.asarray(conc, dtype),
        jnp.asarray(1.0 / gain, dtype),
        jnp.asarray(offsets, dtype),
        jnp.asarray(logits, dtype),
        use_pallas=False,
    )
    # manual: log sum_j w_j * Gamma(value - offset_j; conc, 1/gain)
    comp = st.gamma.logpdf(
        value[..., None] - offsets, conc[..., None], scale=gain
    ) + logits
    want = np.log(np.exp(comp).sum(-1))
    tol = 1e-5 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=tol, atol=tol)


def test_ksmogn_log_prob_and_sample_roundtrip():
    from tapqir_tpu.distributions.ksmogn import ksmogn_log_prob, ksmogn_sample

    P = 14
    key = jax.random.PRNGKey(0)
    N, F, C, K = 2, 3, 1, 2
    h = jnp.full((N, F, C, K), 3000.0)
    w = jnp.full((N, F, C, K), 1.4)
    x = jnp.zeros((N, F, C, K))
    y = jnp.zeros((N, F, C, K))
    target = jnp.full((N, F, C, 2), (P - 1) / 2)
    b = jnp.full((N, F, C), 150.0)
    gain = 7.0
    off_s = jnp.array([88.0, 90.0, 92.0])
    off_l = jnp.log(jnp.ones(3) / 3)
    m = jnp.ones((N, F, C, K))

    img = ksmogn_sample(key, h, w, x, y, target, b, gain, off_s, off_l, P, m)
    assert img.shape == (N, F, C, P, P)
    assert float(img.min()) > 80.0

    lp = ksmogn_log_prob(img, h, w, x, y, target, b, gain, off_s, off_l, P, m, use_pallas=False)
    assert lp.shape == (N, F, C)
    assert np.all(np.isfinite(np.asarray(lp)))

    # wildly wrong parameters should score much lower
    lp_bad = ksmogn_log_prob(
        img, h * 100, w, x, y, target, b, gain, off_s, off_l, P, m, use_pallas=False
    )
    assert np.all(np.asarray(lp_bad) < np.asarray(lp))


def test_ksmogn_crosstalk_shapes():
    from tapqir_tpu.distributions.ksmogn import ksmogn_image, ksmogn_log_prob

    P, N, F, Q, C, K = 14, 2, 3, 2, 2, 2
    h = jnp.full((N, F, Q, K), 3000.0)
    w = jnp.full((N, F, Q, K), 1.4)
    x = jnp.zeros((N, F, Q, K))
    y = jnp.zeros((N, F, Q, K))
    target = jnp.full((N, F, C, 2), (P - 1) / 2)
    b = jnp.full((N, F, C), 150.0)
    alpha = jnp.array([[0.9, 0.1], [0.15, 0.85]])
    m = jnp.ones((N, F, Q, K))

    mu = ksmogn_image(h, w, x, y, target, b, P, m, alpha)
    assert mu.shape == (N, F, C, P, P)
    # channel mixing conserves total signal: sum over channels of spot mass
    spot_mass = float((mu - b[..., None, None]).sum())
    np.testing.assert_allclose(spot_mass, N * F * Q * K * 3000.0, rtol=1e-3)

    value = mu + 90.0
    lp = ksmogn_log_prob(
        value, h, w, x, y, target, b, 7.0,
        jnp.array([88.0, 90.0, 92.0]), jnp.log(jnp.ones(3) / 3),
        P, m, alpha, use_pallas=False,
    )
    assert lp.shape == (N, F)


def test_sigmoid_transforms_never_saturate():
    """float32 sigmoid rounds to exactly 1.0 for u > ~16.6, which turns
    log1p(-p) into -inf and poisons the ELBO with 0 * -inf = NaN after long
    fits (m_probs drifting along the asymptote). The transforms must keep
    values strictly inside their intervals."""
    import jax.numpy as jnp

    from tapqir_tpu import constraints

    u = jnp.asarray(np.array([-100.0, -30.0, 0.0, 30.0, 100.0], np.float32))
    p = constraints.unit_interval()(u)
    assert np.isfinite(np.log(np.asarray(p))).all()
    assert np.isfinite(np.log1p(-np.asarray(p))).all()
    lo, hi = -7.5, 7.5
    x = np.asarray(constraints.interval(lo, hi)(u))
    assert (x > lo).all() and (x < hi).all()
    # round trip still works away from saturation
    t = constraints.unit_interval()
    np.testing.assert_allclose(np.asarray(t(t.inverse(0.3))), 0.3, rtol=1e-5)


def test_positive_transform_clamps_instead_of_overflowing():
    """float32 exp(u) is inf for u > ~88.7; a near-zero-gradient site can
    random-walk there under Adam (docs/elife_scale_run.md's h_beta NaNs).
    The exp-based transforms must saturate finitely, with zero gradient at
    the rail (draining momentum) and exact exp inside the usable range."""
    import jax

    from tapqir_tpu import constraints

    for t in (constraints.positive(), constraints.greater_than(2.0)):
        hi = t(jnp.asarray(120.0, jnp.float32))
        lo = t(jnp.asarray(-120.0, jnp.float32))
        assert np.isfinite(hi) and np.isfinite(lo)
        assert lo >= (2.0 if "greater" in t.name else 0.0)
        g = jax.grad(lambda u: jnp.sum(t(u)))(jnp.asarray(120.0, jnp.float32))
        assert g == 0.0, "gradient must vanish at the clamp rail"
        u = jnp.asarray(3.7, jnp.float32)
        base = 2.0 if "greater" in t.name else 0.0
        np.testing.assert_allclose(t(u) - base, np.exp(3.7), rtol=1e-6)


def test_standard_gamma_grad_matches_exact_igamma_grad():
    """The branch-free torch-parity gamma reparam gradient must agree with
    XLA's exact iterative IgammaGradA to the accuracy torch itself delivers
    (~1e-3 relative) across the full working range of concentrations and
    quantiles."""
    import jax
    from scipy.stats import gamma as sp_gamma

    from tapqir_tpu.distributions.core import standard_gamma_grad

    jax.config.update("jax_enable_x64", True)
    alphas = np.concatenate([
        np.geomspace(0.05, 0.79, 8),
        np.geomspace(0.81, 7.9, 10),
        np.geomspace(8.1, 5000, 10),
    ])
    qs = np.array([0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999])
    A, Q = np.meshgrid(alphas, qs, indexing="ij")
    X = sp_gamma.ppf(Q, A)
    exact = np.asarray(
        jax.lax.random_gamma_grad(jnp.asarray(A), jnp.asarray(X))
    )
    approx = np.asarray(standard_gamma_grad(jnp.asarray(A), jnp.asarray(X)))
    rel = np.abs(approx - exact) / np.maximum(np.abs(exact), 1e-30)
    assert rel.max() < 1e-3, f"max rel err {rel.max():.2e}"
