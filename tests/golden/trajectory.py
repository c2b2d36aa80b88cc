"""Fixed-seed trajectory + posterior regression goldens (VERDICT r4 #5).

BASELINE.md's "matching ELBO trajectories and posterior outputs" clause
cannot be checked against the reference's Pyro stack offline (pyro/funsor
absent — README), so the offline-feasible remainder is pinned instead:
tapqir-tpu's OWN fixed-seed -ELBO trajectory and end-state posterior
summaries per model, committed as goldens. Any silent estimator drift
(a changed log-prob, a broken scale factor, a reordered sampler) moves the
iteration-50 loss immediately and fails these.

The goldens are produced by the SAME module fixtures the e2e tests use
(full-batch fits: deterministic given the seed and platform; the test
suite runs on the CPU backend per tests/conftest.py), so checking them
costs no extra fit or XLA compile.

Regenerate deliberately after an INTENTIONAL estimator/sampling change:

    TAPQIR_REGEN_GOLDENS=1 python -m pytest tests/ -k trajectory_golden -q

(reference analog: /root/reference/test/test_tapqir.py:53-93 fixed-config
end-to-end fits.)
"""

import os
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).parent


def summarize(model):
    """Deterministic scalars/arrays worth pinning for one fitted model."""
    out = {
        "elbo_trajectory": np.asarray(model._rolling["-ELBO"], np.float64),
    }
    for name in ("gain_loc", "proximity_loc", "lamda_loc"):
        out[name] = np.asarray(model.param(name), np.float64)
    z = np.asarray(model.z_probs, np.float64)  # (..., 1+S), key PRNGKey(0)
    p_spec = z[..., 1:].sum(-1)
    out["p_specific_mean"] = np.asarray(p_spec.mean())
    out["p_specific_head"] = p_spec[:2, :5].ravel()
    return out


def assert_matches_golden(model, name):
    path = GOLDEN_DIR / f"trajectory_{name}.npz"
    got = summarize(model)
    if os.environ.get("TAPQIR_REGEN_GOLDENS"):
        with open(path, "wb") as f:
            np.savez(f, **got)
        return
    assert path.exists(), (
        f"missing golden {path}; generate with TAPQIR_REGEN_GOLDENS=1"
    )
    with np.load(path) as z:
        want = {k: z[k] for k in z.files}
    assert set(got) == set(want), (set(got), set(want))
    # losses are O(1e4): relative; probabilities are O(1): absolute
    np.testing.assert_allclose(
        got["elbo_trajectory"], want["elbo_trajectory"], rtol=1e-3,
        err_msg=f"{name}: -ELBO trajectory drifted",
    )
    for p in ("gain_loc", "proximity_loc", "lamda_loc"):
        np.testing.assert_allclose(
            got[p], want[p], rtol=5e-3, err_msg=f"{name}: {p} drifted"
        )
    for p in ("p_specific_mean", "p_specific_head"):
        np.testing.assert_allclose(
            got[p], want[p], atol=5e-3, err_msg=f"{name}: {p} drifted"
        )
