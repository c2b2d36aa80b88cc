"""eLife-DatasetA-scale convergence run (VERDICT r2 #3, r3 #3/#6).

The real eLife 2022 DatasetA (gelles-brandeis, doi 10.7554/eLife.73860) is
not fetchable in this offline environment, so this runs the largest honest
proxy: a simulated dataset at EXACTLY the reference workload's shape -
Nt = 856 AOIs (DatasetA is 331 on-target + 525 off-target; the simulator's
split is 428 + 428, same total), F = 790 frames, P = 14, with ground-truth
labels retained - fit with the reference's documented defaults (lr 5e-3,
10 AOI x 512 frame minibatch, convergence-criterion stopping; reference
docs/source/tutorials/part_ii_linux.rst:76-203 budget 100k iters).

``--model`` selects the family: cosmos (C=1), crosstalk (C=2 dyes, alpha
bleed-through), cosmos+hmm (C=1, kon/koff Markov chain, full-F batches; the
converged fit is additionally pushed through the ttfb and dwelltime CLIs to
recover the kinetic rates).

Produces, under --out (default /tmp/tapqir_elife/<model>):

* a full SVI fit to CONVERGENCE on the ambient device (TPU), wall-clocked;
* p(specific) posterior probabilities, MCC / Recall / Precision vs the
  simulated ground truth, SNR, and the global-parameter posteriors
  (save_stats artifacts: params .npz, summary.csv);
* a single JSON line on stdout with the headline numbers, which
  docs/elife_scale_run.md records.

Run:  python scripts/elife_convergence.py [--model M] [--iters 0] [--out DIR]
(iters 0 = run until the rolling convergence criterion fires.)
"""

import argparse
import os
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


def model_sim_params(model_name):
    p = dict(SIM_PARAMS)
    if model_name == "crosstalk":
        p["alpha"] = [[0.85, 0.15], [0.1, 0.9]]
    elif model_name == "cosmos+hmm":
        del p["pi"]
        p.update(kon=0.02, koff=0.2)
    return p


def build_dataset(out: Path, model_name="cosmos", Nt=856, F=790, P=14,
                  n_chunk=8):
    """Simulate the eLife-scale dataset in AOI chunks, KEEPING labels."""
    from tapqir_tpu.utils.dataset import (
        CosmosDataset, OffsetData, load, save,
    )
    from tapqir_tpu.utils.simulate import simulate

    C = 2 if model_name == "crosstalk" else 1
    sim_params = model_sim_params(model_name)
    out.mkdir(parents=True, exist_ok=True)
    if (out / "data.tpqr").exists():
        data = load(out)
        if data.Nt == Nt and data.F == F and data.labels is not None:
            return data

    per = Nt // n_chunk
    chunks = [
        simulate(model_name, N=per, F=F, C=C, P=P, seed=i, params=sim_params)
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
        name=f"elife-scale-{model_name}",
    )
    save(data, out)
    return data


def recover_kinetics(out: Path):
    """Run the ttfb + dwelltime CLIs on the converged hmm fit and collect
    the recovered rates (VERDICT r3 #6)."""
    import pandas as pd
    from click.testing import CliRunner

    from tapqir_tpu.main import app

    runner = CliRunner()
    rates = {}
    r = runner.invoke(app, [
        "--cd", str(out), "ttfb", "--model", "cosmos+hmm",
        "--num-samples", "500", "--num-iter", "5000",
    ])
    if r.exit_code == 0:
        df = pd.read_csv(out / "cosmos+hmm_ttfb-params-channel0.csv",
                         index_col=0)
        rates["ttfb"] = {k: round(float(df.loc[k, "Mean"]), 5)
                         for k in df.index}
    else:
        rates["ttfb_error"] = str(r.exception)[:200]
    r = runner.invoke(app, [
        "--cd", str(out), "dwelltime", "--model", "cosmos+hmm",
        "--num-samples", "200", "--num-iter", "5000", "-K", "1",
    ])
    if r.exit_code == 0:
        kon = pd.read_csv(out / "cosmos+hmm_dwelltime-kon-channel0.csv",
                          index_col=0)
        koff = pd.read_csv(out / "cosmos+hmm_dwelltime-koff-channel0.csv",
                           index_col=0)
        rates["kon"] = {k: round(float(kon.loc[k, "Mean"]), 5)
                        for k in kon.index}
        rates["koff"] = {k: round(float(koff.loc[k, "Mean"]), 5)
                         for k in koff.index}
    else:
        rates["dwelltime_error"] = str(r.exception)[:200]
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cosmos",
                    choices=["cosmos", "crosstalk", "cosmos+hmm"])
    ap.add_argument("--iters", type=int, default=0,
                    help="0 = run to convergence (max 100k)")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--frame-sampling", default="random",
                    choices=["random", "window"],
                    help="frame minibatch scheme (A/B: independent subsets "
                         "vs cyclic window)")
    ap.add_argument("--fit-model", default=None,
                    choices=[None, "cosmos", "crosstalk", "cosmos+hmm"],
                    help="model family to FIT (defaults to --model; e.g. "
                         "fit cosmos on the hmm-simulated dataset as the "
                         "warm-start stage)")
    ap.add_argument("--warm-start", action="store_true",
                    help="cosmos+hmm: initialize from the workspace's "
                         "converged cosmos fit (run --fit-model cosmos on "
                         "the same --out first)")
    args = ap.parse_args()
    out = args.out or Path("/tmp/tapqir_elife") / args.model.replace("+", "_")
    fit_name = args.fit_model or args.model

    import jax

    # persistent compile cache: re-invocations of the same workload skip
    # the multi-minute XLA/Mosaic compiles (content-addressed per program)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TAPQIR_COMPILE_CACHE", "/tmp/tapqir-jax-cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from tapqir_tpu.models import models

    data = build_dataset(out, model_name=args.model)
    model = models[fit_name]()
    model.frame_sampling = args.frame_sampling
    model.data = data
    model.path = out
    model.run_path = out / ".tapqir"
    # hmm's z-chain needs every frame per batch row (no frame subsampling)
    fbatch = data.F if fit_name == "cosmos+hmm" else 512
    model.init(lr=0.005, nbatch_size=10, fbatch_size=fbatch)
    if args.warm_start and fit_name == "cosmos+hmm":
        if getattr(model, "iter", 0) == 0:
            print("[elife] warm-starting cosmos+hmm from the cosmos fit",
                  file=sys.stderr, flush=True)
            model.warm_start_from_cosmos()
        else:
            print("[elife] checkpoint exists; warm start skipped (resuming)",
                  file=sys.stderr, flush=True)
    # checkpoint cadence 200 (reference), but fetch/write the full state
    # only every 10th checkpoint: the 43 MB state costs ~3 s through the
    # axon tunnel and would dominate the wall clock
    model.full_checkpoint_every = 10

    print(f"[elife] device: {jax.devices()[0].platform}", file=sys.stderr,
          flush=True)
    iters0 = getattr(model, "iter", 0)
    t0 = time.perf_counter()
    model.run(args.iters)
    wall_fit = time.perf_counter() - t0
    iters = model.iter
    done_now = max(iters - iters0, 1)
    print(f"[elife] fit: {iters} cumulative iters ({done_now} this "
          f"invocation) in {wall_fit:.0f} s ({done_now / wall_fit:.1f} "
          f"steps/s sustained), converged={model.converged}",
          file=sys.stderr, flush=True)

    t1 = time.perf_counter()
    summary = model.compute_stats(CI=0.95)
    wall_stats = time.perf_counter() - t1

    # headline posterior quantities
    p_spec = np.asarray(model.z_probs)[..., 1:].sum(-1)  # (Nt, F, Q)
    n_on = int(data.is_ontarget.sum())
    result = {
        "metric": "elife_scale_convergence_run",
        "model": fit_name,
        "dataset_model": args.model,
        "frame_sampling": args.frame_sampling,
        "warm_start": bool(args.warm_start),
        "device": jax.devices()[0].platform,
        "Nt": data.Nt, "F": data.F, "P": data.P, "C": data.C,
        "iters": iters,
        "converged": bool(model.converged),
        "iters_this_invocation": done_now,
        "wall_fit_s": round(wall_fit, 1),
        "steps_per_sec_sustained": round(done_now / wall_fit, 1),
        "wall_stats_s": round(wall_stats, 1),
        "p_specific_mean_ontarget": round(float(p_spec[:n_on].mean()), 4),
        "summary": {
            k: (round(float(v), 4) if np.isscalar(v) or np.ndim(v) == 0
                else np.round(np.asarray(v, float), 4).tolist())
            for k, v in summary.loc[
                [i for i in summary.index
                 if str(i).split("_")[0] in
                 ("gain", "pi", "alpha", "init", "trans", "lamda",
                  "proximity", "SNR", "MCC", "Recall", "Precision")],
                "Mean",
            ].items()
        },
    }
    if fit_name == "cosmos+hmm":
        result["kinetics"] = recover_kinetics(out)
        result["kinetics"]["truth"] = {"kon": 0.02, "koff": 0.2}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
