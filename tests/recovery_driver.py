"""Standalone parameter-recovery driver, run as a subprocess by
tests/test_recovery.py.

Why a subprocess: the pytest process pins jax to an 8-virtual-device CPU
backend (tests/conftest.py, needed by the sharding tests), where an 8k-iter
SVI fit costs ~25-40 min on this class of box (~4-7 it/s on one CPU core -
measured; there is no pytest-specific slowdown, CPU is simply that slow for
this workload). A fresh process uses the ambient default platform instead -
the real TPU when one is attached (200+ it/s, ~1 min per fit), CPU
otherwise - so ``--runslow`` stays runnable every round.

Usage: python recovery_driver.py <cosmos|crosstalk|cosmos+hmm>
Exits 0 on success; assertion failures print and exit 1.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import subprocess

# Probe the ambient platform in a THROWAWAY subprocess with a timeout: when
# the TPU tunnel is wedged, jax.devices() neither returns nor raises (the
# device-claim leg spins forever), so an in-process try/except would hang
# this driver - and the whole --runslow suite - indefinitely.
try:
    _probe = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True,
        timeout=180,
    )
    _probe_err = (
        None if _probe.returncode == 0
        else _probe.stderr.decode(errors="replace")[-200:]
    )
except subprocess.TimeoutExpired:
    _probe_err = "device claim timed out after 180 s"

import jax

if _probe_err is not None:
    print(f"default platform unavailable ({_probe_err!r}); falling back to "
          "CPU", file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from sklearn.metrics import matthews_corrcoef

from tapqir_tpu.models import models
from tapqir_tpu.utils.simulate import simulate

BASE = {
    "width": 1.4, "gain": 7.0, "lamda": 0.15, "proximity": 0.2,
    "offset": 90.0, "height": 3000, "background": 150,
}
ITERS = 8000


def _fit(name, sim_params, N, F, C, seed=0, iters=None):
    data = simulate(name, N=N, F=F, C=C, P=14, seed=seed, params=sim_params)
    model = models[name]()
    model.data = data
    tmp = Path(tempfile.mkdtemp())
    model.path = tmp
    model.run_path = tmp / ".tapqir"
    model.init(lr=0.005, nbatch_size=min(N, 10), fbatch_size=min(F, 512))
    model.run(iters or ITERS, progress_bar=lambda it: it)
    return model, data


def _mcc(model, data):
    n_on = int(data.is_ontarget.sum())
    p = np.asarray(model.z_probs)[:n_on, ..., 1:].sum(-1)  # (n_on, F, Q)
    true_z = np.asarray(data.labels["z"][:n_on]).reshape(p.shape)
    return matthews_corrcoef(true_z.ravel() > 0, (p > 0.5).ravel())


def check_cosmos():
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


def check_crosstalk():
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


def check_hmm():
    # proximity is the slowest-annealing global (the eLife-scale runs show
    # it still moving past 100k iterations); the hmm chain sharpens it
    # slower than cosmos does, so give this fit a longer budget to land
    # inside the same recovery window
    model, data = _fit(
        "cosmos+hmm", {**BASE, "kon": 0.2, "koff": 0.2}, N=12, F=80, C=1,
        iters=16000,
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


CHECKS = {
    "cosmos": check_cosmos,
    "crosstalk": check_crosstalk,
    "cosmos+hmm": check_hmm,
}

if __name__ == "__main__":
    name = sys.argv[1]
    print(f"recovery[{name}] on backend {jax.default_backend()}", file=sys.stderr)
    CHECKS[name]()
    print(f"recovery[{name}] PASS", file=sys.stderr)
