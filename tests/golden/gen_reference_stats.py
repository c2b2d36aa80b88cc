"""Golden values for SNR / chi2 from the REFERENCE'S OWN stats code.

Provenance: imports ``/root/reference/tapqir/utils/stats.py`` (unmodified
reference source) and evaluates ``snr_and_chi2`` (reference stats.py:29-86)
on fixed-seed float64 inputs in the reference's K-leading layout, writing
inputs + outputs to ``reference_stats.npz``.

Shims: the reference package __init__ chain pulls funsor/pyro, so the
package modules ``tapqir``/``tapqir.distributions``/``tapqir.utils`` are
registered as bare namespace packages (their __init__ bodies never run) and
``pyro.distributions`` / ``pyro.ops.stats`` are stubbed - stats.py imports
``dist``, ``hpdi`` and ``quantile`` at module level but ``snr_and_chi2``
touches none of them. Every executed line is reference-authored.

Run: python tests/golden/gen_reference_stats.py
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/tapqir")
OUT = Path(__file__).resolve().parent / "reference_stats.npz"


def _install_shims():
    pyro = types.ModuleType("pyro")
    pyro_dist = types.ModuleType("pyro.distributions")
    pyro_ops = types.ModuleType("pyro.ops")
    pyro_ops_stats = types.ModuleType("pyro.ops.stats")
    pyro_ops_stats.hpdi = None  # imported by stats.py, unused by snr_and_chi2
    pyro_ops_stats.quantile = None
    pyro.distributions = pyro_dist
    pyro.ops = pyro_ops
    pyro_ops.stats = pyro_ops_stats
    for name, mod in (
        ("pyro", pyro),
        ("pyro.distributions", pyro_dist),
        ("pyro.ops", pyro_ops),
        ("pyro.ops.stats", pyro_ops_stats),
    ):
        sys.modules[name] = mod

    # bare namespace packages: point at the reference tree WITHOUT running
    # the real __init__ bodies (they import funsor/pyro)
    for name, path in (
        ("tapqir", REF),
        ("tapqir.distributions", REF / "distributions"),
        ("tapqir.utils", REF / "utils"),
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = [str(path)]
        sys.modules[name] = pkg


def main():
    if not REF.exists():
        sys.exit(f"reference not found at {REF}; using committed npz")
    _install_shims()
    torch.set_default_dtype(torch.float64)
    stats = importlib.import_module("tapqir.utils.stats")

    rng = np.random.default_rng(404)
    K, N, F, P = 2, 3, 4, 14

    def t(a):
        return torch.as_tensor(np.asarray(a, np.float64))

    # reference layout: spot params are K-leading (K, N, F)
    height = rng.uniform(500, 5000, (K, N, F))
    width = rng.uniform(1.0, 2.2, (K, N, F))
    x = rng.uniform(-3, 3, (K, N, F))
    y = rng.uniform(-3, 3, (K, N, F))
    target_locs = rng.uniform(5.0, 8.0, (N, F, 2))
    background = rng.uniform(50, 300, (N, F))
    data = rng.uniform(70, 4000, (N, F, P, P))
    theta_probs = rng.dirichlet(np.ones(K), (N, F)).transpose(2, 0, 1)
    gain, offset_mean, offset_var = 7.3, 90.2, 61.7

    snr, chi2 = stats.snr_and_chi2(
        t(data), t(height), t(width), t(x), t(y), t(target_locs),
        t(background), gain, offset_mean, offset_var, P, t(theta_probs),
    )

    np.savez_compressed(
        OUT,
        height=height, width=width, x=x, y=y, target_locs=target_locs,
        background=background, data=data, theta_probs=theta_probs,
        gain=gain, offset_mean=offset_mean, offset_var=offset_var,
        P=P, snr=snr.numpy(), chi2=chi2.numpy(),
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
