"""Generate golden values by RUNNING THE REFERENCE'S OWN CODE.

Provenance
----------
This script imports ``/root/reference/tapqir/distributions/{util,ksmogn}.py``
— the reference implementation's actual source, unmodified — and evaluates:

* ``KSMOGN(use_pykeops=False).log_prob`` in both the cosmos (C-channel) and
  crosstalk (alpha-mixed) configurations (ref ksmogn.py:70-238),
* ``KSMOGN.mean``-equivalent expected images via the ``image`` property,
* ``gaussian_spots`` (ref util.py:15-64),
* ``truncated_poisson_probs`` / ``probs_m`` / ``expand_offtarget`` /
  ``probs_theta`` (ref util.py:67-173),

on fixed-seed float64 inputs, and writes the inputs + outputs to
``reference_goldens.npz``.  ``tests/test_reference_goldens.py`` then asserts
this repo's JAX implementations reproduce the numbers.  Unlike the
estimator-parity oracle (same-author), a failure here means disagreement
with *the reference's code itself*, not with our reading of it.

Why shims: the reference's full SVI stack needs pyro+funsor+pykeops (not
installed, no network).  But its likelihood core only touches pyro for the
``TorchDistribution`` base class (a thin mixin over
``torch.distributions.Distribution``) and pykeops for an optional fast
path with an exact pure-torch fallback (``use_pykeops=False``, ref
ksmogn.py:222-236).  We stub those two imports with no-ops; every number
below is produced by reference-authored lines.

Run:  python tests/golden/gen_reference_goldens.py  (requires
/root/reference to be present; the committed npz is used by tests
otherwise).
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF_DISTS = Path("/root/reference/tapqir/distributions")
OUT = Path(__file__).resolve().parent / "reference_goldens.npz"


def _install_shims():
    """Stub pykeops + pyro.distributions just enough to import ksmogn.py."""
    pykeops = types.ModuleType("pykeops")
    pykeops.set_verbose = lambda *a, **k: None
    pykeops_torch = types.ModuleType("pykeops.torch")

    class Genred:  # never called: we pass use_pykeops=False
        def __init__(self, *a, **k):
            raise AssertionError("pykeops path must not be used")

    pykeops_torch.Genred = Genred
    pykeops.torch = pykeops_torch
    sys.modules["pykeops"] = pykeops
    sys.modules["pykeops.torch"] = pykeops_torch

    pyro = types.ModuleType("pyro")
    pyro_dist = types.ModuleType("pyro.distributions")

    class TorchDistribution(torch.distributions.Distribution):
        """pyro's TorchDistribution is torch's Distribution plus shape
        mixins that KSMOGN.__init__/log_prob never touch."""

    pyro_dist.TorchDistribution = TorchDistribution
    pyro.distributions = pyro_dist
    sys.modules["pyro"] = pyro
    sys.modules["pyro.distributions"] = pyro_dist


def _import_reference():
    pkg = types.ModuleType("ref_dists")
    pkg.__path__ = [str(REF_DISTS)]
    sys.modules["ref_dists"] = pkg
    util = importlib.import_module("ref_dists.util")
    ksmogn = importlib.import_module("ref_dists.ksmogn")
    return util, ksmogn


def _rng(seed):
    return np.random.default_rng(seed)


def t(x):
    return torch.as_tensor(np.asarray(x, np.float64))


def cosmos_case(ksmogn, rng, N=3, F=4, C=1, K=2, P=14, J=7):
    """KSMOGN in the cosmos configuration: batch (N,F,C), event (P,P)."""
    height = rng.uniform(500, 5000, (N, F, C, K))
    width = rng.uniform(1.0, 2.2, (N, F, C, K))
    x = rng.uniform(-3, 3, (N, F, C, K))
    y = rng.uniform(-3, 3, (N, F, C, K))
    target_locs = rng.uniform(5.0, 8.0, (N, F, C, 2))
    background = rng.uniform(50, 300, (N, F, C))
    gain = 7.3
    m = rng.integers(0, 2, (N, F, C, K)).astype(np.float64)
    offset_samples = np.sort(rng.uniform(60, 120, J))
    w = rng.uniform(0.2, 1.0, J)
    offset_logits = np.log(w / w.sum())
    # values straddle the offset support so the mask path is exercised
    value = rng.uniform(65, 4000, (N, F, C, P, P))

    dist = ksmogn.KSMOGN(
        t(height), t(width), t(x), t(y), t(target_locs), t(background),
        t(gain), t(offset_samples), t(offset_logits), P, m=t(m),
        use_pykeops=False,
    )
    lp = dist.log_prob(t(value))
    img = dist.image
    return dict(
        height=height, width=width, x=x, y=y, target_locs=target_locs,
        background=background, gain=gain, m=m, offset_samples=offset_samples,
        offset_logits=offset_logits, value=value,
        log_prob=lp.numpy(), image=img.numpy(),
    )


def crosstalk_case(ksmogn, rng, N=2, F=3, Q=2, C=2, K=2, P=14, J=5):
    """KSMOGN with alpha mixing: batch (N,F), event (C,P,P)."""
    height = rng.uniform(500, 5000, (N, F, Q, K))
    width = rng.uniform(1.0, 2.2, (N, F, Q, K))
    x = rng.uniform(-3, 3, (N, F, Q, K))
    y = rng.uniform(-3, 3, (N, F, Q, K))
    target_locs = rng.uniform(5.0, 8.0, (N, F, C, 2))
    background = rng.uniform(50, 300, (N, F, C))
    gain = 6.1
    m = rng.integers(0, 2, (N, F, Q, K)).astype(np.float64)
    alpha = np.array([[0.85, 0.15], [0.08, 0.92]])
    offset_samples = np.sort(rng.uniform(60, 120, J))
    w = rng.uniform(0.2, 1.0, J)
    offset_logits = np.log(w / w.sum())
    value = rng.uniform(65, 4000, (N, F, C, P, P))

    dist = ksmogn.KSMOGN(
        t(height), t(width), t(x), t(y), t(target_locs), t(background),
        t(gain), t(offset_samples), t(offset_logits), P, m=t(m),
        alpha=t(alpha), use_pykeops=False,
    )
    lp = dist.log_prob(t(value))
    img = dist.image
    return dict(
        height=height, width=width, x=x, y=y, target_locs=target_locs,
        background=background, gain=gain, m=m, alpha=alpha,
        offset_samples=offset_samples, offset_logits=offset_logits,
        value=value, log_prob=lp.numpy(), image=img.numpy(),
    )


def util_cases(util, rng):
    out = {}
    lamda = rng.uniform(0.01, 2.0, 6)
    for K in (2, 3):
        out[f"tpois_K{K}"] = util.truncated_poisson_probs(t(lamda), K).numpy()
        out[f"probs_m_K{K}"] = util.probs_m(t(lamda), K).numpy()
        out[f"probs_theta_K{K}"] = util.probs_theta(
            K, torch.device("cpu")
        ).numpy()
    out["lamda"] = lamda
    pi = rng.dirichlet([2.0, 1.0], 3)
    out["pi"] = pi
    out["expand_offtarget"] = util.expand_offtarget(t(pi)).numpy()
    # bare gaussian_spots (cosmos layout, no m)
    N, F, C, K, P = 2, 3, 1, 2, 14
    h = rng.uniform(500, 5000, (N, F, C, K))
    w_ = rng.uniform(1.0, 2.2, (N, F, C, K))
    xs = rng.uniform(-3, 3, (N, F, C, K))
    ys = rng.uniform(-3, 3, (N, F, C, K))
    tl = rng.uniform(5.0, 8.0, (N, F, C, 1, 2))
    out["gs_height"], out["gs_width"] = h, w_
    out["gs_x"], out["gs_y"], out["gs_target_locs"] = xs, ys, tl
    out["gs_P"] = np.array(P)
    out["gaussian_spots"] = util.gaussian_spots(
        t(h), t(w_), t(xs), t(ys), t(tl), P
    ).numpy()
    return out


def main():
    if not REF_DISTS.exists():
        sys.exit(f"reference not found at {REF_DISTS}; using committed npz")
    _install_shims()
    util, ksmogn = _import_reference()
    torch.set_default_dtype(torch.float64)

    arrays = {}
    for k, v in cosmos_case(ksmogn, _rng(101)).items():
        arrays[f"cosmos_{k}"] = v
    for k, v in crosstalk_case(ksmogn, _rng(202)).items():
        arrays[f"xtalk_{k}"] = v
    arrays.update(util_cases(util, _rng(303)))
    np.savez_compressed(OUT, **{k: np.asarray(v) for k, v in arrays.items()})
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(arrays)} arrays)")


if __name__ == "__main__":
    main()
