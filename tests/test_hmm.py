"""End-to-end tests for the cosmos+hmm model."""

import numpy as np
import pytest

from tapqir_tpu.models import models
from tapqir_tpu.utils.dataset import save
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "kon": 0.2,
    "koff": 0.2,
    "width": 1.4,
    "gain": 7.0,
    "lamda": 0.15,
    "proximity": 0.2,
    "offset": 90.0,
    "height": 3000,
    "background": 150,
}


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("hmm")
    data = simulate("cosmos+hmm", N=4, F=30, C=1, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    model = models["cosmos+hmm"]()
    model.load(tmp_path)
    model.init(lr=0.005, nbatch_size=4, fbatch_size=30)
    model.checkpoint_interval = 50  # denser rolling points, shorter fit
    model.run(200, progress_bar=lambda it: it)
    return model, tmp_path


def test_registry_has_hmm():
    assert "cosmos+hmm" in models


def test_elbo_decreases(fitted):
    model, _ = fitted
    losses = model._rolling["-ELBO"]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_z_probs_track_labels(fitted):
    model, _ = fitted
    z_probs = model.z_probs  # (Nt, F, C, 1+S)
    assert z_probs.shape == (4, 30, 1, 2)
    np.testing.assert_allclose(z_probs.sum(-1), 1.0, atol=1e-4)
    true_z = model.data.labels["z"][..., 0].ravel()
    p_spec = z_probs[:2, :, 0, 1].ravel()
    pos = p_spec[true_z == 1]
    neg = p_spec[true_z == 0]
    if len(pos) and len(neg):
        assert pos.mean() > neg.mean(), (
            f"posterior does not separate states: pos {pos.mean()}, neg {neg.mean()}"
        )


def test_theta_probs_and_stats(fitted):
    model, tmp_path = fitted
    import os

    os.environ["CI"] = "true"
    model.compute_stats(CI=0.95)
    assert (tmp_path / "cosmos+hmm_params.tpqr").exists()
    assert (tmp_path / "cosmos+hmm_summary.csv").exists()
    for param in ("gain", "proximity", "lamda", "trans"):
        assert param in model.summary.index
    th = model.theta_probs
    assert th.shape == (2, 4, 30, 1)
    assert np.isfinite(th).all()
    assert (th >= 0).all() and (th <= 1 + 1e-6).all()


def test_z_sample_shapes(fitted):
    model, _ = fitted
    zs = model.z_sample(7)
    assert zs.shape == (7, 2, 30, 1)
    assert set(np.unique(zs)) <= {0, 1}


def test_warm_start_from_cosmos(tmp_path):
    """cosmos -> hmm warm start: the chain marginals reproduce the cosmos
    posterior at step 0, shared guide params carry over, and the fit runs."""
    data = simulate("cosmos+hmm", N=4, F=30, C=1, P=14, seed=3, params=PARAMS)
    save(data, tmp_path)

    cm = models["cosmos"]()
    cm.load(tmp_path)
    cm.init(lr=0.005, nbatch_size=4, fbatch_size=30)
    cm.checkpoint_interval = 50
    cm.run(100, progress_bar=lambda it: it)

    hm = models["cosmos+hmm"]()
    hm.load(tmp_path)
    hm.init(lr=0.005, nbatch_size=4, fbatch_size=30)
    hm.warm_start_from_cosmos(num_particles=5)

    # shared continuous guide params copied verbatim
    for name in ("gain_loc", "proximity_loc", "b_loc", "h_loc", "x_mean"):
        np.testing.assert_allclose(
            np.asarray(hm.params[name]), np.asarray(cm.params[name]),
            rtol=1e-6,
        )

    # chain marginals == cosmos posterior marginals (up to the eps clip)
    zp_cosmos, _ = cm.compute_probs_arrays(num_particles=5)
    zp_hmm = hm.z_probs  # (Nt, F, C, 1+S)
    np.testing.assert_allclose(
        zp_hmm[: data.N], zp_cosmos[: data.N], atol=5e-2
    )

    # trans estimate is row-stochastic and diagonally dominant for a
    # kon/koff chain with persistence
    trans = hm.param("trans_mean")
    np.testing.assert_allclose(trans.sum(-1), 1.0, atol=1e-5)

    # the warm-started fit runs and keeps a finite loss
    hm.checkpoint_interval = 50
    hm.run(100, progress_bar=lambda it: it)
    assert np.isfinite(hm._rolling["-ELBO"]).all()


@pytest.mark.slow
def test_elbo_finite_grads(fitted):
    import jax
    import jax.numpy as jnp

    model, _ = fitted
    key = jax.random.PRNGKey(5)

    def loss(params_u):
        return -model.elbo(params_u, key, model._data_dev)

    val, grads = jax.value_and_grad(loss)(model.params)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), f"non-finite grad for {k}"


def test_trajectory_golden(fitted, trajectory_golden_check):
    """Fixed-seed -ELBO trajectory + posterior regression (VERDICT r4 #5)."""
    model, _ = fitted
    trajectory_golden_check(model, "cosmos+hmm")
