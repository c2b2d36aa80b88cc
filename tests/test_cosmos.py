"""End-to-end tests for the cosmos model: simulate -> fit -> stats.

Mirrors the reference test strategy (test/test_tapqir.py:20-93) plus
numerical regression checks the reference lacks (SURVEY.md section 4).
"""

import numpy as np
import pytest

from tapqir_tpu.models import models
from tapqir_tpu.utils.dataset import save
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "pi": 0.3,
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
    tmp_path = tmp_path_factory.mktemp("cosmos")
    data = simulate("cosmos", N=4, F=40, C=1, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    model = models["cosmos"]()
    model.load(tmp_path)
    model.init(lr=0.005, nbatch_size=4, fbatch_size=40)
    model.checkpoint_interval = 50  # denser rolling points, shorter fit
    model.run(200, progress_bar=lambda it: it)
    return model, tmp_path


def test_elbo_decreases(fitted):
    model, _ = fitted
    losses = model._rolling["-ELBO"]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"-ELBO did not decrease: {losses}"
    assert np.isfinite(losses).all()


def test_checkpoint_saved_and_resumes(fitted):
    import jax

    model, tmp_path = fitted
    assert (tmp_path / ".tapqir" / "cosmos_model.tpqr").exists()
    m2 = models["cosmos"]()
    m2.load(tmp_path)
    m2.init(lr=0.005, nbatch_size=4, fbatch_size=40)
    assert m2.iter == model.iter
    for k in model.params:
        np.testing.assert_allclose(
            np.asarray(m2.params[k]), np.asarray(model.params[k]), rtol=1e-6
        )
    # resume continues the RNG stream: the restored key equals the trained
    # model's current key, not a fresh PRNGKey(0) (which would replay the
    # same minibatch sequence on every resume)
    assert np.array_equal(np.asarray(m2._key), np.asarray(model._key))
    assert not np.array_equal(
        np.asarray(m2._key), np.asarray(jax.random.PRNGKey(0))
    )


def test_posterior_detects_spots(fitted):
    model, _ = fitted
    z_probs, theta_probs = model.compute_probs
    assert z_probs.shape == (4, 40, 1, 2)
    assert theta_probs.shape == (2, 4, 40, 1)
    assert np.isfinite(z_probs).all()
    # probabilities normalized
    np.testing.assert_allclose(z_probs[:2].sum(-1), 1.0, atol=1e-3)
    # classification should beat chance on the simulated ground truth
    true_z = model.data.labels["z"][..., 0].ravel()  # (N, F)
    p_spec = z_probs[:2, :, 0, 1].ravel()
    auc_pairs = 0
    n_pairs = 0
    rng = np.random.default_rng(0)
    pos = p_spec[true_z == 1]
    neg = p_spec[true_z == 0]
    if len(pos) and len(neg):
        for _ in range(500):
            auc_pairs += pos[rng.integers(len(pos))] > neg[rng.integers(len(neg))]
            n_pairs += 1
        auc = auc_pairs / n_pairs
        assert auc > 0.8, f"posterior p(specific) AUC too low: {auc}"


def test_stats_outputs(fitted):
    model, tmp_path = fitted
    import os

    os.environ["CI"] = "true"  # skip plot generation, as the reference does
    model.compute_stats(CI=0.95, save_matlab=True)
    assert (tmp_path / "cosmos_params.tpqr").exists()
    assert (tmp_path / "cosmos_summary.csv").exists()
    assert (tmp_path / "cosmos_params.mat").exists()
    summary = model.summary
    for param in ("gain", "proximity", "lamda", "pi"):
        assert param in summary.index
    # accuracy metrics exist because the simulation has labels
    assert "MCC" in summary.index
    # gain should be in a sane range around the simulated value 7
    assert 0.5 < summary.loc["gain", "Mean"] < 50

    params = model.params_stats
    assert params["p_specific"].shape == (4, 40, 1)
    assert "chi2" in params


def test_stats_nondefault_ci_columns(fitted):
    """CI != 0.95 must write into its own columns (regression: writes used
    hardcoded '95% LL' labels)."""
    import os

    model, _ = fitted
    os.environ["CI"] = "true"
    summary = model.compute_stats(CI=0.68)
    assert "68% LL" in summary.columns and "68% UL" in summary.columns
    assert "95% LL" not in summary.columns
    ll = float(summary.loc["gain", "68% LL"])
    ul = float(summary.loc["gain", "68% UL"])
    assert np.isfinite(ll) and np.isfinite(ul) and ll < ul


@pytest.mark.slow
def test_elbo_reproducible_and_finite(fitted):
    """Numerical regression: same key -> same ELBO; finite gradients."""
    import jax
    import jax.numpy as jnp

    model, _ = fitted
    key = jax.random.PRNGKey(123)
    e1 = model.elbo(model.params, key, model._data_dev)
    e2 = model.elbo(model.params, key, model._data_dev)
    assert np.isfinite(float(e1))
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)

    def loss(params_u):
        return -model.elbo(params_u, key, model._data_dev)

    grads = jax.grad(loss)(model.params)
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), f"non-finite grad for {k}"


def test_trajectory_golden(fitted, trajectory_golden_check):
    """Fixed-seed -ELBO trajectory + posterior regression (VERDICT r4 #5):
    estimator drift moves the iteration-50 loss immediately."""
    model, _ = fitted
    trajectory_golden_check(model, "cosmos")
