"""Measure the REFERENCE's own likelihood cost on this box's CPU.

VERDICT r2 called the 10 steps/s reference-GPU anchor an assumption and
suggested "reference CPU timing via installed pyro, or an arithmetic bound
from the pykeops kernel". pyro/pykeops cannot be installed offline, but the
reference's KSMOGN has an exact pure-torch fallback (use_pykeops=False,
reference ksmogn.py:222-236) that runs under the same import shims the
golden generators use (tests/golden/gen_reference_goldens.py). This script
times THAT code - reference-authored lines, unmodified - on the reference's
own default fitting workload:

* minibatch 10 AOIs x 512 frames x C=1 (reference main.py:1429-1431),
* P = 14, K = 2 spots, 61 offset bins (realistic post-bin_hist size),
* float64 (the reference fits in double, main.py:428),
* the 2^K = 4 enumerated m-configurations that reach the obs site under
  TraceEnum_ELBO (m is the only enumerated variable the image likelihood
  depends on),
* forward log_prob + backward to all continuous latents (what every SVI
  step pays), including the spot re-render inside the graph.

The measured number is an OPTIMISTIC upper bound on reference-CPU SVI
throughput: a real pyro step adds guide sampling, the trace machinery's
Python overhead (dozens of effect-handler sites per step), the prior terms
and the Adam update. It anchors `bench.py`'s vs_baseline ratios with a
measured point on identical hardware; the GPU anchor remains an assumption,
bracketed by this measurement and the arithmetic bound documented in
README "Benchmark baselines".

Run: python scripts/bench_reference_cpu.py  (prints one JSON line)
"""

import importlib
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_DISTS = Path("/root/reference/tapqir/distributions")


def _install_shims():
    """Stub pykeops + pyro.distributions just enough to import ksmogn.py
    (same shims as tests/golden/gen_reference_goldens.py)."""
    pykeops = types.ModuleType("pykeops")
    pykeops.set_verbose = lambda *a, **k: None
    pykeops_torch = types.ModuleType("pykeops.torch")

    class Genred:
        def __init__(self, *a, **k):
            raise AssertionError("pykeops path must not be used")

    pykeops_torch.Genred = Genred
    pykeops.torch = pykeops_torch
    sys.modules["pykeops"] = pykeops
    sys.modules["pykeops.torch"] = pykeops_torch

    pyro = types.ModuleType("pyro")
    pyro_dist = types.ModuleType("pyro.distributions")

    class TorchDistribution(torch.distributions.Distribution):
        pass

    pyro_dist.TorchDistribution = TorchDistribution
    pyro.distributions = pyro_dist
    sys.modules["pyro"] = pyro
    sys.modules["pyro.distributions"] = pyro_dist


def _import_reference():
    pkg = types.ModuleType("ref_dists")
    pkg.__path__ = [str(REF_DISTS)]
    sys.modules["ref_dists"] = pkg
    return importlib.import_module("ref_dists.ksmogn")


def main():
    _install_shims()
    ksmogn = _import_reference()

    n, f, C, K, P, J = 10, 512, 1, 2, 14, 61
    rng = np.random.default_rng(0)

    def t64(x, grad=False):
        out = torch.as_tensor(np.asarray(x, np.float64))
        if grad:
            out.requires_grad_(True)
        return out

    # the 4 enumerated m-configurations as a leading batch axis, exactly the
    # broadcast shape pyro's enumeration hands the obs site
    m_cfg = np.stack(
        [[(c >> k) & 1 for k in range(K)] for c in range(2**K)]
    ).astype(np.float64)  # (4, K)
    m = np.broadcast_to(m_cfg[:, None, None, None, :], (4, n, f, C, K))

    height = t64(rng.uniform(500, 5000, (n, f, C, K)), grad=True)
    width = t64(rng.uniform(1.0, 2.2, (n, f, C, K)), grad=True)
    x = t64(rng.uniform(-3, 3, (n, f, C, K)), grad=True)
    y = t64(rng.uniform(-3, 3, (n, f, C, K)), grad=True)
    background = t64(rng.uniform(50, 300, (n, f, C)), grad=True)
    gain = t64(7.0, grad=True)
    target_locs = t64(np.full((n, f, C, 2), (P - 1) / 2))
    centers = np.arange(60, 60 + J, dtype=np.float64)
    wts = np.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    offset_logits = np.log(wts / wts.sum())
    value = t64(rng.uniform(121, 4000, (n, f, C, P, P)))
    leaves = [height, width, x, y, background, gain]

    def step():
        d = ksmogn.KSMOGN(
            height, width, x, y, target_locs, background, gain,
            t64(centers), t64(offset_logits), P, m=t64(m),
            use_pykeops=False,
        )
        lp = d.log_prob(value).sum()
        grads = torch.autograd.grad(lp, leaves)
        return lp.item(), grads

    lp, _ = step()  # warmup (allocator, MKL thread pools)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    dt = (time.perf_counter() - t0) / reps

    out = {
        "metric": "reference_ksmogn_likelihood_fwd_bwd_cpu_seconds_per_step",
        "value": round(dt, 3),
        "unit": f"s/step (float64, {4}x{n}x{f} m-cfg x AOI x frame, "
                f"P={P}, J={J} bins; reference code via import shim)",
        "steps_per_sec_upper_bound_cpu": round(1.0 / dt, 3),
        "log_prob_sum": lp,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
