"""Benchmark: cosmos SVI steps/sec at eLife-DatasetA scale on one chip.

Config mirrors the reference's headline workload (BASELINE.md): ~331
on-target + ~526 off-target AOIs x 790 frames, P=14, C=1, minibatch
10 AOIs x 512 frames, Adam lr 5e-3 - the reference's defaults
(tapqir/main.py:1429-1432). The offset histogram gets 61 distinct bins
(a realistic post-bin_hist size; the inner logsumexp cost scales with it).

Baseline: the reference publishes no numbers (SURVEY.md section 6).
BASELINE.md documents convergence at 50k-100k SVI steps as an overnight-to-
hours single-GPU run; we take 10 steps/s as the assumed reference-GPU rate
(100k steps ~ 2.8 h) for vs_baseline. The driver-set north star is >=20x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

REF_GPU_STEPS_PER_SEC = 10.0
CACHE = Path(os.environ.get("TAPQIR_BENCH_CACHE", "/tmp/tapqir_bench"))

SIM_PARAMS = {
    "pi": 0.15, "width": 1.4, "gain": 7.0, "lamda": 0.15,
    "proximity": 0.2, "offset": 90.0, "height": 3000, "background": 150,
}


def build_dataset(Nt=856, F=790, C=1, P=14, n_offsets=61):
    """Simulate an eLife-scale dataset in AOI chunks (bounded device memory)."""
    from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, save
    from tapqir_tpu.utils.simulate import simulate

    CACHE.mkdir(parents=True, exist_ok=True)
    path = CACHE / "data.tpqr"
    if path.exists():
        from tapqir_tpu.utils.dataset import load

        data = load(CACHE)
        if data.Nt == Nt and data.F == F:
            return data

    chunks = []
    n_chunk = 8
    per = Nt // n_chunk
    for i in range(n_chunk):
        d = simulate("cosmos", N=per, F=F, C=C, P=P, seed=i, params=SIM_PARAMS)
        chunks.append(d)
    images = np.concatenate([d.images for d in chunks])
    xy = np.concatenate([d.xy for d in chunks])
    is_ontarget = np.concatenate([d.is_ontarget for d in chunks])

    # realistic empirical offset histogram: 61 integer bins around 90
    centers = np.arange(90 - n_offsets // 2, 90 + n_offsets // 2 + 1, dtype=np.float64)
    w = np.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    w /= w.sum()
    data = CosmosDataset(
        images=images, xy=xy, is_ontarget=is_ontarget,
        offset=OffsetData(centers, w), name="bench-elife-scale",
    )
    save(data, CACHE)
    return data


def main():
    import jax

    from tapqir_tpu.models import models

    data = build_dataset()
    model = models["cosmos"]()
    model.data = data
    model.path = CACHE
    model.run_path = CACHE / ".tapqir"
    model.init(lr=0.005, nbatch_size=10, fbatch_size=512)

    # warmup/compile (same nsteps as the timed run -> single compilation)
    n_steps = 200
    key = jax.random.PRNGKey(0)
    p, o, losses = model._run_chunk(model.params, model.opt_state, key, n_steps)
    np.asarray(losses)

    # timed run
    t0 = time.perf_counter()
    p, o, losses = model._run_chunk(p, o, jax.random.PRNGKey(1), n_steps)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    assert np.isfinite(losses).all(), "non-finite losses in benchmark run"

    steps_per_sec = n_steps / dt
    print(
        json.dumps(
            {
                "metric": "cosmos_svi_steps_per_sec_elife_scale_1chip",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s (batch 10 AOIs x 512 frames, P14, 61 offset bins)",
                "vs_baseline": round(steps_per_sec / REF_GPU_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
