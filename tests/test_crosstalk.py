"""End-to-end tests for the crosstalk model."""

import numpy as np
import pytest

from tapqir_tpu.models import models
from tapqir_tpu.utils.dataset import save
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "pi": 0.3,
    "alpha": [[0.85, 0.15], [0.1, 0.9]],
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
    tmp_path = tmp_path_factory.mktemp("crosstalk")
    data = simulate("crosstalk", N=4, F=20, C=2, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    model = models["crosstalk"]()
    model.load(tmp_path)
    model.init(lr=0.005, nbatch_size=4, fbatch_size=20)
    model.checkpoint_interval = 50  # denser rolling points
    model.run(200, progress_bar=lambda it: it)
    return model, tmp_path


def test_registry_has_crosstalk():
    assert "crosstalk" in models


def test_elbo_decreases(fitted):
    model, _ = fitted
    losses = model._rolling["-ELBO"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] or len(losses) == 1


def test_posterior_and_stats(fitted):
    model, tmp_path = fitted
    import os

    os.environ["CI"] = "true"
    model.compute_stats(CI=0.95)
    assert (tmp_path / "crosstalk_params.tpqr").exists()
    assert (tmp_path / "crosstalk_summary.csv").exists()
    for param in ("gain", "pi", "lamda", "alpha"):
        assert param in model.summary.index
    z_probs, theta_probs = model.compute_probs
    assert z_probs.shape == (4, 20, 2, 2)
    assert theta_probs.shape == (2, 4, 20, 2)
    assert np.isfinite(z_probs).all()
    # alpha guide stays a simplex
    alpha = model.param("alpha_mean")
    np.testing.assert_allclose(alpha.sum(-1), 1.0, atol=1e-5)


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
    trajectory_golden_check(model, "crosstalk")
