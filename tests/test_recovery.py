"""Parameter-recovery tests: fit simulated data, assert the posterior
recovers the generating parameters (VERDICT round 1: the crosstalk
likelihood miscalibration trained "successfully" because no test asserted
recovery; this class of test makes that impossible for all three models).

Slow (20k SVI iterations each on CPU): run with --runslow.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest
from sklearn.metrics import matthews_corrcoef

from tapqir_tpu.models import models
from tapqir_tpu.utils.simulate import simulate

BASE = {
    "width": 1.4, "gain": 7.0, "lamda": 0.15, "proximity": 0.2,
    "offset": 90.0, "height": 3000, "background": 150,
}
ITERS = 8000

pytestmark = pytest.mark.slow


def _fit(name, sim_params, N, F, C, seed=0):
    data = simulate(name, N=N, F=F, C=C, P=14, seed=seed, params=sim_params)
    model = models[name]()
    model.data = data
    tmp = Path(tempfile.mkdtemp())
    model.path = tmp
    model.run_path = tmp / ".tapqir"
    model.init(lr=0.005, nbatch_size=min(N, 10), fbatch_size=min(F, 512))
    model.run(ITERS, progress_bar=lambda it: it)
    return model, data


def _mcc(model, data):
    n_on = int(data.is_ontarget.sum())
    p = np.asarray(model.z_probs)[:n_on, ..., 1:].sum(-1)  # (n_on, F, Q)
    true_z = np.asarray(data.labels["z"][:n_on]).reshape(p.shape)
    return matthews_corrcoef(true_z.ravel() > 0, (p > 0.5).ravel())


def test_cosmos_recovers_parameters():
    model, data = _fit("cosmos", {**BASE, "pi": 0.15}, N=20, F=80, C=1)
    gain = float(model.param("gain_loc"))
    assert abs(gain - 7.0) / 7.0 < 0.10, f"gain {gain} != 7"
    prox = float(model.param("proximity_loc"))
    assert 0.15 < prox < 0.28, f"proximity {prox} != 0.2"
    lamda = float(model.param("lamda_loc")[0])
    assert lamda < 0.35, f"lamda {lamda} != 0.15"
    pi = np.asarray(model.param("pi_mean"))
    assert 0.08 < pi[0, 1] < 0.28, f"pi {pi} != [0.85, 0.15]"
    mcc = _mcc(model, data)
    assert mcc > 0.9, f"MCC {mcc}"


def test_crosstalk_recovers_parameters():
    model, data = _fit(
        "crosstalk",
        {**BASE, "pi": 0.3, "alpha": [[0.85, 0.15], [0.1, 0.9]]},
        N=12, F=40, C=2,
    )
    gain = float(model.param("gain_loc"))
    assert abs(gain - 7.0) / 7.0 < 0.10, f"gain {gain} != 7"
    alpha = np.asarray(model.param("alpha_mean"))
    # crosstalk mixing matrix diagonal recovered within 0.05 absolute
    assert abs(alpha[0, 0] - 0.85) < 0.05, f"alpha {alpha}"
    assert abs(alpha[1, 1] - 0.90) < 0.05, f"alpha {alpha}"
    mcc = _mcc(model, data)
    # crosstalk MCC should be at the cosmos level (calibrated: ~0.99)
    assert mcc > 0.9, f"MCC {mcc}"


def test_hmm_recovers_parameters():
    model, data = _fit(
        "cosmos+hmm", {**BASE, "kon": 0.2, "koff": 0.2}, N=12, F=80, C=1
    )
    gain = float(model.param("gain_loc"))
    assert abs(gain - 7.0) / 7.0 < 0.10, f"gain {gain} != 7"
    prox = float(model.param("proximity_loc"))
    assert 0.15 < prox < 0.28, f"proximity {prox} != 0.2"
    lamda = float(model.param("lamda_loc")[0])
    assert lamda < 0.35, f"lamda {lamda} != 0.15"
    trans = np.asarray(model.param("trans_mean"))[0]  # (S+1, S+1)
    assert abs(trans[0, 1] - 0.2) < 0.08, f"kon {trans}"
    assert abs(trans[1, 0] - 0.2) < 0.08, f"koff {trans}"
    mcc = _mcc(model, data)
    assert mcc > 0.9, f"MCC {mcc}"
