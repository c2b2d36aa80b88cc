"""Generate scan + CI-mapping goldens by RUNNING THE REFERENCE'S OWN CODE.

Provenance
----------
Two reference pieces are extracted verbatim from their source files with
``ast`` (so the heavyweight module imports — funsor, pyro handlers,
matplotlib — never execute) and evaluated on fixed-seed float64 inputs:

* ``hmm._sequential_logmatmulexp`` + ``hmm._contraction_identity``
  (/root/reference/tapqir/models/hmm.py:480-539) — the reference's
  hand-rolled Blelloch up/down-sweep prefix product in log space, the
  exact algorithm this repo's ``ops/scan.py:cumulative_logmatmulexp``
  replaces with ``jax.lax.associative_scan``.  Its one external callee,
  ``_logmatmulexp`` (from ``pyro.distributions.hmm``, not installed
  here), is shimmed with the standard definition
  ``logsumexp(x[..., :, None] + y[..., None, :, :], -2)`` — two
  unambiguous lines of textbook math, stated here so the provenance is
  exact; every other executed line is reference-authored.

* ``torch_to_scipy_dist`` (/root/reference/tapqir/utils/stats.py:262-293)
  — the guide-family -> scipy frozen-distribution mapping whose
  ``.interval(CI)`` endpoints become the reported credible intervals
  (reference cosmos.py:771-772).  The ``dist`` namespace it dispatches on
  is stubbed with attribute-carrying classes (pyro is not installed); the
  AffineBeta stub does NOT subclass Beta, matching pyro where AffineBeta
  is a TransformedDistribution, so the isinstance chain takes the same
  branch as with real pyro types.  AffineBeta's mean/size ->
  concentration1/0 conversion uses the reference's own formula
  (/root/reference/tapqir/distributions/affine_beta.py:35-36).

Writes inputs + outputs to ``reference_scan_ci.npz``;
``tests/test_reference_goldens.py`` asserts this repo's
``cumulative_logmatmulexp`` and ``ci_from_scipy`` reproduce the numbers.

Run:  python tests/golden/gen_reference_scan_ci.py
"""

import ast
from pathlib import Path

import numpy as np
import scipy.stats
import torch

HERE = Path(__file__).resolve().parent
OUT = HERE / "reference_scan_ci.npz"
REF_HMM = Path("/root/reference/tapqir/models/hmm.py")
REF_STATS = Path("/root/reference/tapqir/utils/stats.py")


def _extract_functions(path, names, cls_method=False):
    """Compile only the named top-level (or class-level) function defs from
    ``path`` — none of the module's imports run."""
    tree = ast.parse(path.read_text())
    found = {}
    nodes = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in names:
            node.decorator_list = []  # drop @staticmethod
            nodes.append(node)
            found[node.name] = node
    missing = set(names) - set(found)
    assert not missing, f"not found in {path}: {missing}"
    mod = ast.Module(body=nodes, type_ignores=[])
    ast.fix_missing_locations(mod)
    return compile(mod, str(path), "exec")


def _logmatmulexp(x, y):
    """Shim for pyro.distributions.hmm._logmatmulexp (see module docstring):
    numerically stable log(exp(x) @ exp(y))."""
    return torch.logsumexp(x.unsqueeze(-1) + y.unsqueeze(-3), dim=-2)


def gen_scan(out):
    ns = {"torch": torch, "_logmatmulexp": _logmatmulexp}
    code = _extract_functions(
        REF_HMM, {"_sequential_logmatmulexp", "_contraction_identity"}
    )
    exec(code, ns)

    class hmm:  # the reference functions reference `hmm._contraction_identity`
        _contraction_identity = staticmethod(ns["_contraction_identity"])

    ns["hmm"] = hmm
    seq = ns["_sequential_logmatmulexp"]

    rng = np.random.default_rng(20260820)
    cases = {
        # (name, shape (..., T, C, S, S)): odd/even T, batch dims, S=2/3
        "scan_a": (13, 1, 2, 2),
        "scan_b": (16, 1, 3, 3),
        "scan_c": (4, 10, 2, 2, 2),  # batch_shape = (4,)
        "scan_d": (1, 1, 2, 2),  # T=1 root case
    }
    for name, shape in cases.items():
        logits = rng.normal(size=shape).astype(np.float64)
        alphas = seq(torch.tensor(logits, dtype=torch.float64))
        out[f"{name}_logits"] = logits
        out[f"{name}_alphas"] = alphas.numpy()


class _Gamma:
    def __init__(self, concentration, rate):
        self.concentration = torch.tensor(concentration, dtype=torch.float64)
        self.rate = torch.tensor(rate, dtype=torch.float64)


class _Beta:
    def __init__(self, c1, c0):
        self.concentration1 = torch.tensor(c1, dtype=torch.float64)
        self.concentration0 = torch.tensor(c0, dtype=torch.float64)


class _AffineBeta:  # NOT a _Beta subclass (see module docstring)
    def __init__(self, mean, sample_size, low, high):
        mean = torch.tensor(mean, dtype=torch.float64)
        sample_size = torch.tensor(sample_size, dtype=torch.float64)
        low = torch.tensor(low, dtype=torch.float64)
        high = torch.tensor(high, dtype=torch.float64)
        # reference affine_beta.py:35-36
        self.concentration1 = sample_size * (mean - low) / (high - low)
        self.concentration0 = sample_size * (high - mean) / (high - low)
        self.loc = low
        self.scale = high - low


class _Dirichlet:
    def __init__(self, concentration):
        self.concentration = torch.tensor(concentration, dtype=torch.float64)


class _Independent:
    def __init__(self, base_dist):
        self.base_dist = base_dist


class _Delta:
    pass


def gen_ci(out):
    import types

    dist = types.SimpleNamespace(
        Gamma=_Gamma, Beta=_Beta, AffineBeta=_AffineBeta,
        Dirichlet=_Dirichlet, Independent=_Independent, Delta=_Delta,
    )
    ns = {"dist": dist, "stats": scipy.stats}
    exec(_extract_functions(REF_STATS, {"torch_to_scipy_dist"}), ns)
    to_scipy = ns["torch_to_scipy_dist"]

    rng = np.random.default_rng(7)
    CI = 0.95

    # gamma (gain/lamda/background/height guides)
    conc = rng.uniform(0.5, 500.0, size=(4, 5))
    rate = rng.uniform(0.01, 50.0, size=(4, 5))
    ll, ul = to_scipy(_Gamma(conc, rate)).interval(CI)
    out["ci_gamma_conc"], out["ci_gamma_rate"] = conc, rate
    out["ci_gamma_ll"], out["ci_gamma_ul"] = ll, ul

    # affine-beta (width/x/y/proximity guides)
    low, high = -7.5, 7.5
    mean = rng.uniform(low + 0.5, high - 0.5, size=(3, 6))
    size = rng.uniform(2.1, 400.0, size=(3, 6))
    ll, ul = to_scipy(_AffineBeta(mean, size, low, high)).interval(CI)
    out["ci_ab_mean"], out["ci_ab_size"] = mean, size
    out["ci_ab_low"] = np.float64(low)
    out["ci_ab_high"] = np.float64(high)
    out["ci_ab_ll"], out["ci_ab_ul"] = ll, ul

    # dirichlet (pi/init/trans guides) -> per-component Beta marginals
    dconc = rng.uniform(0.2, 30.0, size=(2, 3))
    ll, ul = to_scipy(_Dirichlet(dconc)).interval(CI)
    out["ci_dir_conc"] = dconc
    out["ci_dir_ll"], out["ci_dir_ul"] = ll, ul

    # Independent wrapper unwraps; Delta maps to None
    d = to_scipy(_Independent(_Gamma(conc, rate)))
    np.testing.assert_allclose(d.interval(CI)[0], out["ci_gamma_ll"])
    assert to_scipy(_Delta()) is None
    out["ci_level"] = np.float64(CI)


def main():
    # the reference fits in double precision (its main.py sets the torch
    # default dtype); _contraction_identity builds torch.eye() at the
    # default dtype, so the golden must run under the same setting
    torch.set_default_dtype(torch.float64)
    out = {}
    gen_scan(out)
    gen_ci(out)
    np.savez(OUT, **out)
    print(f"wrote {OUT} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
