"""Numerical parity of the Pallas offset-gamma kernel vs the XLA path.

Runs the kernel in interpreter mode on CPU; the same code path compiles via
Mosaic on real TPU (exercised by bench.py / the driver).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("TAPQIR_PALLAS_INTERPRET", "1")


def _case(M=4, n_px=500, J=7, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.integers(95, 400, size=(n_px,)).astype(np.float32)
    conc = rng.uniform(10.0, 80.0, size=(M, n_px)).astype(np.float32)
    rate = np.float32(1.0 / 7.0)
    g = np.sort(rng.integers(80, 95, size=J)).astype(np.float32)
    w = np.log(rng.dirichlet(np.ones(J))).astype(np.float32)
    return value, conc, rate, g, w


def test_forward_matches_xla():
    from tapqir_tpu.distributions.ksmogn import _offset_gamma_log_prob_xla
    from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

    value, conc, rate, g, w = _case()
    got = offset_gamma_log_prob_pallas(
        jnp.asarray(value), jnp.asarray(conc), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    )
    want = _offset_gamma_log_prob_xla(
        jnp.asarray(value), jnp.asarray(conc), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_forward_masked_pixels():
    """Pixels below every offset bin must come out ~ -inf in both paths."""
    from tapqir_tpu.distributions.ksmogn import _offset_gamma_log_prob_xla
    from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

    value, conc, rate, g, w = _case(n_px=130)
    value[:5] = 50.0  # below all offsets
    got = offset_gamma_log_prob_pallas(
        jnp.asarray(value), jnp.asarray(conc), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    )
    got = np.asarray(got)
    assert (got[:, :5] < -1e29).all()
    want = np.asarray(
        _offset_gamma_log_prob_xla(
            jnp.asarray(value), jnp.asarray(conc), jnp.asarray(rate),
            jnp.asarray(g), jnp.asarray(w),
        )
    )
    np.testing.assert_allclose(got[:, 5:], want[:, 5:], rtol=2e-5, atol=2e-5)
    assert np.isneginf(want[:, :5]).all()


def test_gradients_match_xla():
    from tapqir_tpu.distributions.ksmogn import _offset_gamma_log_prob_xla
    from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

    value, conc, rate, g, w = _case(M=2, n_px=260)
    cotangent = np.asarray(
        np.random.default_rng(1).normal(size=conc.shape), np.float32
    )

    def loss_pallas(c, r):
        out = offset_gamma_log_prob_pallas(
            jnp.asarray(value), c, r, jnp.asarray(g), jnp.asarray(w)
        )
        return (out * cotangent).sum()

    def loss_xla(c, r):
        out = _offset_gamma_log_prob_xla(
            jnp.asarray(value), c, r, jnp.asarray(g), jnp.asarray(w)
        )
        return (out * cotangent).sum()

    gp_c, gp_r = jax.grad(loss_pallas, argnums=(0, 1))(
        jnp.asarray(conc), jnp.asarray(rate)
    )
    gx_c, gx_r = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(conc), jnp.asarray(rate)
    )
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gx_c), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(float(gp_r), float(gx_r), rtol=1e-3)


def test_singleton_m_squeeze():
    from tapqir_tpu.distributions.ksmogn import _offset_gamma_log_prob_xla
    from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

    value, conc, rate, g, w = _case(M=1, n_px=140)
    got = offset_gamma_log_prob_pallas(
        jnp.asarray(value), jnp.asarray(conc[0]), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    )
    want = _offset_gamma_log_prob_xla(
        jnp.asarray(value), jnp.asarray(conc[0]), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    )
    assert got.shape == value.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_summed_path_matches_per_pixel_sum():
    from tapqir_tpu.distributions.ksmogn import (
        _offset_gamma_log_prob_xla,
        offset_gamma_log_prob_summed,
    )

    value, conc, rate, g, w = _case(M=4, n_px=3 * 5 * 196)
    value6 = value.reshape(3, 5, 196)
    conc6 = conc.reshape(4, 3, 5, 196)
    got = offset_gamma_log_prob_summed(
        jnp.asarray(value6), jnp.asarray(conc6), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w), event_ndims=1, use_pallas=True,
    )
    want = _offset_gamma_log_prob_xla(
        jnp.asarray(value6), jnp.asarray(conc6), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    ).sum(-1)
    assert got.shape == (4, 3, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-3)


def test_summed_kernel_padded_ev_matches_xla():
    """The in-kernel event reduction (offset_gamma_summed_pallas): padded
    pixels masked out of the sum, value-independent Gamma terms added, and
    the custom VJP's concentration gradient flows only through real pixels."""
    from tapqir_tpu.distributions.ksmogn import (
        _offset_gamma_log_prob_xla,
        offset_gamma_log_prob_summed,
    )

    rng = np.random.default_rng(3)
    M, nb, ev, ev_pad, J = 4, 12, 196, 256, 7
    value = rng.integers(95, 400, size=(nb, ev)).astype(np.float32)
    conc = rng.uniform(10.0, 80.0, size=(M, nb, ev)).astype(np.float32)
    g = np.sort(rng.integers(80, 95, size=J)).astype(np.float32)
    w = np.log(rng.dirichlet(np.ones(J))).astype(np.float32)
    rate = np.float32(1.0 / 7.0)
    value_p = np.concatenate(
        [value, np.full((nb, ev_pad - ev), g.max() + 1.0, np.float32)], -1
    )
    conc_p = np.concatenate(
        [conc, np.full((M, nb, ev_pad - ev), 5.0, np.float32)], -1
    )
    got = offset_gamma_log_prob_summed(
        jnp.asarray(value_p), jnp.asarray(conc_p), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
        event_ndims=1, use_pallas=True, ev=ev,
    )
    want = _offset_gamma_log_prob_xla(
        jnp.asarray(value), jnp.asarray(conc), jnp.asarray(rate),
        jnp.asarray(g), jnp.asarray(w),
    ).sum(-1)
    assert got.shape == (M, nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5,
                               atol=1e-2)

    def loss(c):
        return offset_gamma_log_prob_summed(
            jnp.asarray(value_p), c, jnp.asarray(rate),
            jnp.asarray(g), jnp.asarray(w),
            event_ndims=1, use_pallas=True, ev=ev,
        ).sum()

    gr = jax.grad(loss)(jnp.asarray(conc_p))
    assert np.isfinite(np.asarray(gr)).all()
    np.testing.assert_array_equal(np.asarray(gr[..., ev:]), 0.0)
    # gradient parity vs the XLA path on the real pixels
    def loss_xla(c):
        return offset_gamma_log_prob_summed(
            jnp.asarray(value), c, jnp.asarray(rate),
            jnp.asarray(g), jnp.asarray(w),
            event_ndims=1, use_pallas=False,
        ).sum()

    gr_xla = jax.grad(loss_xla)(jnp.asarray(conc))
    np.testing.assert_allclose(
        np.asarray(gr[..., :ev]), np.asarray(gr_xla), rtol=2e-4, atol=1e-4
    )


def test_summed_kernel_vmap_matches_loop():
    """parallel/restarts.py vmaps the whole train step over R chains, which
    pushes a batch axis through the pallas_call + custom_vjp; the batched
    kernel (and its gradients) must agree with a per-chain loop."""
    from tapqir_tpu.distributions.ksmogn import offset_gamma_log_prob_summed

    R = 3
    cases = [_summed_case(seed=s) for s in range(R)]
    value = jnp.stack([jnp.asarray(c[0]) for c in cases])
    conc = jnp.stack([jnp.asarray(c[1]) for c in cases])
    rate, g, w, ev = cases[0][2:]

    def one(v, a):
        return offset_gamma_log_prob_summed(
            v, a, jnp.asarray(rate), jnp.asarray(g), jnp.asarray(w),
            event_ndims=1, use_pallas=True, ev=ev,
        ).sum()

    got = jax.vmap(one)(value, conc)
    want = jnp.stack([one(value[r], conc[r]) for r in range(R)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    gv = jax.vmap(jax.grad(one, argnums=1))(value, conc)
    wv = jnp.stack([jax.grad(one, argnums=1)(value[r], conc[r])
                    for r in range(R)])
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-5, atol=1e-5)


def _summed_case(M=4, nb=12, ev=196, ev_pad=256, J=7, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.integers(95, 400, size=(nb, ev)).astype(np.float32)
    conc = rng.uniform(10.0, 80.0, size=(M, nb, ev)).astype(np.float32)
    g = np.sort(rng.integers(80, 95, size=J)).astype(np.float32)
    w = np.log(rng.dirichlet(np.ones(J))).astype(np.float32)
    rate = np.float32(1.0 / 7.0)
    value_p = np.concatenate(
        [value, np.full((nb, ev_pad - ev), g.max() + 1.0, np.float32)], -1
    )
    conc_p = np.concatenate(
        [conc, np.ones((M, nb, ev_pad - ev), np.float32)], -1
    )
    return value_p, conc_p, rate, g, w, ev


def test_gaussian_spots_flat_matches_reshaped():
    from tapqir_tpu.distributions.util import gaussian_spots, gaussian_spots_flat

    rng = np.random.default_rng(5)
    P, K, ev_pad = 14, 2, 256
    sh = (3, 4, 1, K)
    h = jnp.asarray(rng.uniform(500, 3000, sh), jnp.float32)
    w = jnp.asarray(rng.uniform(1.0, 2.0, sh), jnp.float32)
    x = jnp.asarray(rng.uniform(-2, 2, sh), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 2, sh), jnp.float32)
    t = jnp.asarray(rng.uniform(5, 9, sh[:-1] + (2,)), jnp.float32)
    flat = gaussian_spots_flat(h, w, x, y, t, P, ev_pad)
    full = gaussian_spots(h, w, x, y, t, P).reshape(sh + (P * P,))
    assert flat.shape == sh + (ev_pad,)
    np.testing.assert_allclose(
        np.asarray(flat[..., : P * P]), np.asarray(full), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(flat[..., P * P :]), 0.0)


def test_stirling_lgamma_digamma_golden():
    """In-kernel Stirling lgamma/digamma (Mosaic has no lgamma primitive)
    must match scipy over the realistic concentration range a = mu/gain
    (roughly [1e-2, 5e3]) and stay accurate down to tiny a."""
    import scipy.special as sp

    from tapqir_tpu.ops.offset_gamma import _digamma_stirling, _lgamma_stirling

    a = np.concatenate(
        [np.logspace(-3, 3.7, 3000), np.linspace(0.5, 50.0, 500)]
    )
    jax.config.update("jax_enable_x64", True)  # autouse fixture restores
    lg = np.asarray(_lgamma_stirling(jnp.asarray(a, jnp.float64)))
    dg = np.asarray(_digamma_stirling(jnp.asarray(a, jnp.float64)))
    jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(lg, sp.gammaln(a), rtol=0, atol=5e-9)
    np.testing.assert_allclose(dg, sp.digamma(a), rtol=0, atol=1e-7)
    # float32 evaluation adds only round-off, not series error
    lg32 = np.asarray(_lgamma_stirling(jnp.asarray(a, jnp.float32)))
    rel = np.abs(lg32 - sp.gammaln(a)) / np.maximum(np.abs(sp.gammaln(a)), 1.0)
    assert rel.max() < 1e-5


def _fact_case(Kf=4, nb=12, ev=196, ev_pad=256, J=7, seed=5):
    """Random factored-likelihood inputs at crosstalk-like magnitudes."""
    rng = np.random.default_rng(seed)
    value = rng.integers(95, 3000, size=(nb, ev)).astype(np.float32)
    base = rng.uniform(10.0, 40.0, size=(nb,)).astype(np.float32)
    deltas = rng.uniform(0.0, 300.0, size=(Kf, nb, ev)).astype(np.float32)
    deltas[:, :, rng.integers(0, ev, size=ev // 2)] *= 1e-3  # near-zero px
    g = np.sort(rng.integers(80, 95, size=J)).astype(np.float32)
    w = np.log(rng.dirichlet(np.ones(J))).astype(np.float32)
    rate = np.float32(1.0 / 7.0)
    value_p = np.concatenate(
        [value, np.full((nb, ev_pad - ev), g.max() + 1.0, np.float32)], -1
    )
    deltas_p = np.concatenate(
        [deltas, np.zeros((Kf, nb, ev_pad - ev), np.float32)], -1
    )
    mtab = np.stack(
        np.meshgrid(*([np.arange(2)] * Kf), indexing="ij"), -1
    ).reshape(-1, Kf)
    return value_p, base, deltas_p, mtab, rate, g, w, ev


def test_factored_kernel_matches_xla():
    """The factored kernel (per-spot exponential factors, in-kernel config
    assembly) matches the dense-concentration XLA oracle, fwd + grads."""
    from tapqir_tpu.distributions.ksmogn import offset_gamma_factored_summed

    value_p, base, deltas_p, mtab, rate, g, w, ev = _fact_case()

    def run(use_pallas, v, b, d, r):
        return offset_gamma_factored_summed(
            v, b, d, mtab, r, jnp.asarray(g), jnp.asarray(w),
            ev=ev, use_pallas=use_pallas,
        )

    args = (jnp.asarray(value_p), jnp.asarray(base), jnp.asarray(deltas_p),
            jnp.asarray(rate))
    got = run(True, *args)
    want = run(False, *args)
    assert got.shape == (mtab.shape[0], value_p.shape[0])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-2
    )

    cot = np.asarray(
        np.random.default_rng(1).normal(size=got.shape), np.float32
    )

    def loss(use_pallas, b, d, r):
        return (run(use_pallas, jnp.asarray(value_p), b, d, r) * cot).sum()

    gp = jax.grad(lambda b, d, r: loss(True, b, d, r), argnums=(0, 1, 2))(
        *args[1:]
    )
    gx = jax.grad(lambda b, d, r: loss(False, b, d, r), argnums=(0, 1, 2))(
        *args[1:]
    )
    for a, b_, name in zip(gp, gx, ("base", "deltas", "rate")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )
    # padded pixels contribute no delta gradient
    np.testing.assert_array_equal(np.asarray(gp[1][..., ev:]), 0.0)


def test_factored_kernel_small_base():
    """base < 1 flips the sign of (base - 1): the base factor must shift by
    Lmin instead of Lmax to stay bounded (overflow guard)."""
    from tapqir_tpu.distributions.ksmogn import offset_gamma_factored_summed

    value_p, base, deltas_p, mtab, rate, g, w, ev = _fact_case(
        Kf=2, nb=8, seed=9
    )
    base = np.full_like(base, 0.05)
    args = (jnp.asarray(value_p), jnp.asarray(base), jnp.asarray(deltas_p),
            jnp.asarray(rate))
    got = offset_gamma_factored_summed(
        *args[:1], args[1], args[2], mtab, args[3],
        jnp.asarray(g), jnp.asarray(w), ev=ev, use_pallas=True,
    )
    want = offset_gamma_factored_summed(
        *args[:1], args[1], args[2], mtab, args[3],
        jnp.asarray(g), jnp.asarray(w), ev=ev, use_pallas=False,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-2
    )


def test_factored_kernel_vmap_matches_loop():
    """Restart chains vmap the train step through the factored kernel."""
    from tapqir_tpu.distributions.ksmogn import offset_gamma_factored_summed

    value_p, base, deltas_p, mtab, rate, g, w, ev = _fact_case(Kf=2, nb=8)
    R = 3
    rng = np.random.default_rng(7)
    d_r = jnp.asarray(
        deltas_p[None] * rng.uniform(0.5, 1.5, size=(R, 1, 1, 1)),
        jnp.float32,
    )

    def one(d):
        return offset_gamma_factored_summed(
            jnp.asarray(value_p), jnp.asarray(base), d, mtab,
            jnp.asarray(rate), jnp.asarray(g), jnp.asarray(w),
            ev=ev, use_pallas=True,
        )

    got = jax.vmap(one)(d_r)
    want = jnp.stack([one(d_r[r]) for r in range(R)])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
