"""Generate kinetics goldens by RUNNING THE REFERENCE'S OWN CODE.

Provenance
----------
Loads ``/root/reference/tapqir/utils/imscroll.py`` — the reference
implementation's actual source, unmodified — as a standalone module (its
only non-stdlib deps beyond numpy/pandas/torch are ``pyro.ops.stats.pi`` /
``resample`` and ``pyroapi.distributions``, used exclusively by the
bootstrap helpers we don't evaluate; both are stubbed). Evaluates, on
fixed-seed inputs:

* ``count_intervals`` (Friedman–Gelles interval coding) on a binary
  (samples, aois, frames) array that includes all-zero, all-one,
  starts-bound and ends-bound records — every censoring code;
* ``bound_dwell_times`` / ``unbound_dwell_times`` on those intervals;
* ``time_to_first_binding`` on binary samples AND on per-frame binding
  probabilities (the expected-value path);
* ``association_rate`` / ``dissociation_rate`` on both input kinds.

Writes inputs + outputs to ``reference_kinetics.npz``;
``tests/test_reference_goldens.py`` asserts this repo's implementations
reproduce the numbers. A failure there means disagreement with the
reference's code itself, not with our reading of it.

Run:  python tests/golden/gen_reference_kinetics.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
OUT = HERE / "reference_kinetics.npz"
REF = Path("/root/reference/tapqir/utils/imscroll.py")


def _install_shims():
    pyro = types.ModuleType("pyro")
    ops = types.ModuleType("pyro.ops")
    stats = types.ModuleType("pyro.ops.stats")
    stats.pi = lambda *a, **k: None
    stats.resample = lambda *a, **k: None
    pyro.ops = ops
    ops.stats = stats
    pyroapi = types.ModuleType("pyroapi")
    pyroapi.distributions = types.ModuleType("pyroapi.distributions")

    class Distribution:  # singledispatch registration target only
        pass

    pyroapi.distributions.Distribution = Distribution
    for name, mod in (
        ("pyro", pyro),
        ("pyro.ops", ops),
        ("pyro.ops.stats", stats),
        ("pyroapi", pyroapi),
    ):
        sys.modules[name] = mod


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_imscroll", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_inputs():
    rng = np.random.default_rng(73860)
    S, N, F = 3, 6, 25
    z = (rng.random((S, N, F)) < 0.35).astype(np.int64)
    # force every censoring code and edge shape
    z[:, 0, :] = 0          # all-unbound record
    z[:, 1, :] = 1          # all-bound record
    z[:, 2, 0] = 1          # starts bound
    z[:, 2, -1] = 0
    z[:, 3, 0] = 0
    z[:, 3, -1] = 1         # ends bound
    # every posterior sample must have complete bound AND unbound intervals
    z[:, 4, :] = 0
    z[:, 4, 5:9] = 1
    z[:, 4, 15:17] = 1
    probs = rng.random((S, N, F))
    return z, probs


def main():
    _install_shims()
    ref = _load_reference()
    z, probs = make_inputs()

    intervals = ref.count_intervals(z)
    bound_dt = ref.bound_dwell_times(intervals)
    unbound_dt = ref.unbound_dwell_times(intervals)
    ttfb_binary = ref.time_to_first_binding(z.reshape(-1, z.shape[-1]))
    ttfb_probs = ref.time_to_first_binding(probs.reshape(-1, probs.shape[-1]))
    kon_binary = ref.association_rate(z.astype(np.float64))
    koff_binary = ref.dissociation_rate(z.astype(np.float64))
    kon_probs = ref.association_rate(probs)
    koff_probs = ref.dissociation_rate(probs)

    np.savez_compressed(
        OUT,
        z=z,
        probs=probs,
        intervals_posterior_sample=intervals["posterior_sample"].to_numpy(),
        intervals_aoi=intervals["aoi"].to_numpy(),
        intervals_start_frame=intervals["start_frame"].to_numpy(),
        intervals_stop_frame=intervals["stop_frame"].to_numpy(),
        intervals_dwell_time=intervals["dwell_time"].to_numpy(),
        intervals_low_or_high=intervals["low_or_high"].to_numpy(),
        intervals_z=intervals["z"].to_numpy(),
        bound_dwell_times=bound_dt,
        unbound_dwell_times=unbound_dt,
        ttfb_binary=np.asarray(ttfb_binary, np.float64),
        ttfb_probs=np.asarray(ttfb_probs, np.float64),
        kon_binary=np.asarray(kon_binary, np.float64),
        koff_binary=np.asarray(koff_binary, np.float64),
        kon_probs=np.asarray(kon_probs, np.float64),
        koff_probs=np.asarray(koff_probs, np.float64),
    )
    print(f"wrote {OUT}: {len(intervals)} intervals, "
          f"codes {sorted(set(intervals['low_or_high']))}")


if __name__ == "__main__":
    main()
