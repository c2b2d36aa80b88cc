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
