"""eLife-DatasetA-scale convergence run (VERDICT r2 directive #3).

The real eLife 2022 DatasetA (gelles-brandeis, doi 10.7554/eLife.73860) is
not fetchable in this offline environment, so this runs the largest honest
proxy: a simulated dataset at EXACTLY the reference workload's shape -
Nt = 856 AOIs (DatasetA is 331 on-target + 525 off-target; the simulator's
split is 428 + 428, same total), F = 790 frames, P = 14, C = 1, with
ground-truth labels retained - fit with the reference's documented defaults
(lr 5e-3, 10 AOI x 512 frame minibatch, convergence-criterion stopping;
reference docs/source/tutorials/part_ii_linux.rst:76-203 budget 100k iters).

Produces, under --out (default /tmp/tapqir_elife/cosmos):

* a full SVI fit to CONVERGENCE on the ambient device (TPU), wall-clocked;
* p(specific) posterior probabilities, MCC / Recall / Precision vs the
  simulated ground truth, SNR, and the global-parameter posteriors
  (save_stats artifacts: params .npz, summary.csv);
* a single JSON line on stdout with the headline numbers, which
  docs/elife_scale_run.md records.

Run:  python scripts/elife_convergence.py [--iters 0] [--out DIR]
(iters 0 = run until the rolling convergence criterion fires.)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIM_PARAMS = {
    "pi": 0.15, "width": 1.4, "gain": 7.0, "lamda": 0.15,
    "proximity": 0.2, "offset": 90.0, "height": 3000, "background": 150,
}


def build_dataset(out: Path, Nt=856, F=790, P=14, n_chunk=8):
    """Simulate the eLife-scale dataset in AOI chunks, KEEPING labels."""
    from tapqir_tpu.utils.dataset import (
        CosmosDataset, OffsetData, load, save,
    )
    from tapqir_tpu.utils.simulate import simulate

    out.mkdir(parents=True, exist_ok=True)
    if (out / "data.tpqr").exists():
        data = load(out)
        if data.Nt == Nt and data.F == F and data.labels is not None:
            return data

    per = Nt // n_chunk
    chunks = [
        simulate("cosmos", N=per, F=F, C=1, P=P, seed=i, params=SIM_PARAMS)
        for i in range(n_chunk)
    ]
    centers = np.arange(60, 121, dtype=np.float64)
    w = np.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    w /= w.sum()
    # interleave: all on-target rows first (dataset convention), labels
    # concatenated to match
    n_on = sum(int(d.is_ontarget.sum()) for d in chunks)
    images = np.concatenate(
        [d.images[d.is_ontarget.astype(bool)] for d in chunks]
        + [d.images[~d.is_ontarget.astype(bool)] for d in chunks]
    )
    xy = np.concatenate(
        [d.xy[d.is_ontarget.astype(bool)] for d in chunks]
        + [d.xy[~d.is_ontarget.astype(bool)] for d in chunks]
    )
    labels = np.concatenate([d.labels for d in chunks])
    is_ontarget = np.zeros(images.shape[0], bool)
    is_ontarget[:n_on] = True
    data = CosmosDataset(
        images=images, xy=xy, is_ontarget=is_ontarget,
        labels=labels,
        offset=OffsetData(centers, w),
        name="elife-scale-cosmos",
    )
    save(data, out)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=0,
                    help="0 = run to convergence (max 100k)")
    ap.add_argument("--out", type=Path,
                    default=Path("/tmp/tapqir_elife/cosmos"))
    args = ap.parse_args()

    import jax

    from tapqir_tpu.models import models

    data = build_dataset(args.out)
    model = models["cosmos"]()
    model.data = data
    model.path = args.out
    model.run_path = args.out / ".tapqir"
    model.init(lr=0.005, nbatch_size=10, fbatch_size=512)
    # checkpoint cadence 200 (reference), but fetch/write the full state
    # only every 10th checkpoint: the 43 MB state costs ~3 s through the
    # axon tunnel and would dominate the wall clock
    model.full_checkpoint_every = 10

    print(f"[elife] device: {jax.devices()[0].platform}", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    model.run(args.iters)
    wall_fit = time.perf_counter() - t0
    iters = model.iter
    print(f"[elife] fit: {iters} iters in {wall_fit:.0f} s "
          f"({iters / wall_fit:.1f} steps/s), converged={model.converged}",
          file=sys.stderr, flush=True)

    t1 = time.perf_counter()
    summary = model.compute_stats(CI=0.95)
    wall_stats = time.perf_counter() - t1

    # headline posterior quantities
    p_spec = np.asarray(model.z_probs)[..., 1:].sum(-1)  # (Nt, F, Q)
    n_on = int(data.is_ontarget.sum())
    out = {
        "metric": "elife_scale_convergence_run",
        "device": jax.devices()[0].platform,
        "Nt": data.Nt, "F": data.F, "P": data.P,
        "iters": iters,
        "converged": bool(model.converged),
        "wall_fit_s": round(wall_fit, 1),
        "steps_per_sec": round(iters / wall_fit, 1),
        "wall_stats_s": round(wall_stats, 1),
        "p_specific_mean_ontarget": round(float(p_spec[:n_on].mean()), 4),
        "summary": {
            k: (round(float(v), 4) if np.isscalar(v) or np.ndim(v) == 0
                else np.round(np.asarray(v, float), 4).tolist())
            for k, v in summary.loc[
                [i for i in summary.index
                 if str(i).split("_")[0] in
                 ("gain", "pi", "lamda", "proximity", "SNR", "MCC",
                  "Recall", "Precision")],
                "Mean",
            ].items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
