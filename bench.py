"""Benchmark: SVI steps/sec for all three models at eLife-DatasetA scale
on one chip.

Configs mirror the reference's headline workload (BASELINE.md): ~331
on-target + ~526 off-target AOIs x 790 frames, P=14, minibatch 10 AOIs x
512 frames, Adam lr 5e-3 - the reference's defaults
(tapqir/main.py:1429-1432). The offset histogram gets 61 distinct bins
(a realistic post-bin_hist size; the inner logsumexp cost scales with it).
Per model:

* cosmos    - C=1, the flagship configuration (the headline metric);
* hmm       - C=1 with the FULL 790-frame chain per batch row (no frame
              subsampling: the z-chain needs every frame, reference
              hmm.py:119-125) - the long-context stressor;
* crosstalk - C=2 dyes/channels: 2^(K*Q) = 16 m-configs through the
              likelihood kernel per step.

Baseline: the reference publishes no numbers (SURVEY.md section 6) and
pyro/pykeops are not installed here, so the anchor is an ASSUMPTION, stated
explicitly: 10 SVI steps/s on the reference's single-GPU path, i.e. 100k
steps (the documented convergence budget, part_ii_linux.rst:198-203) in
~2.8 h. All vs_baseline figures are relative to that assumed anchor, per
model. The driver-set north star is >=20x. One bracket point IS measured
with the reference's own code: scripts/bench_reference_cpu.py times its
pure-torch likelihood fallback (the shipped --cpu path) at this exact
workload - 111.7 s/step fwd+bwd on this box's single-core CPU (0.009
steps/s), so the assumed GPU anchor grants the reference ~1,000x over its
own measured CPU path.

Per model, three figures (BASELINE.md's required metrics):

* steps/s - SVI steps per second;
* AoI*frames/s/chip - steps/s x (nbatch x fbatch) target-frame pairs
  scored per step;
* exp-roofline utilization - the likelihood kernel's offset-bin evaluations
  per second (M configs x batch pixels x J bins x steps/s) as a fraction of
  a MEASURED idealized roofline: a fused acc += exp(a*x + b_j) loop on the
  same chip (one FMA + one exp + one add per eval, the kernel's irreducible
  inner math; ~1.3 T evals/s on v5e). This counts the WHOLE step against
  the kernel-math floor, so it folds in Adam, the guide samplers, the spot
  render and the forward+gradient double pass; the kernel alone runs ~3x
  the whole-step rate. The real kernel also pays the log staging, the
  running max, the masked event-sum and gradient-stats accumulation (~6
  extra VPU ops/eval), so tens of percent of this roofline is the
  practical ceiling for the algorithm, not 100%.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"};
"extra" carries all per-model figures.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

REF_GPU_STEPS_PER_SEC = 10.0  # ASSUMED anchor (see module docstring)


def _ensure_device_or_fallback(retries=3, probe_timeout=180):
    """When the TPU tunnel is wedged, ``jax.devices()`` neither returns nor
    raises (the device-claim leg spins forever), which would hang this
    benchmark - and whoever invoked it - indefinitely. Probe the ambient
    platform in a throwaway subprocess with a timeout, retry a few times
    (tunnels flap), then pin jax to CPU with an explicit marker so the run
    still completes with honestly-labeled numbers.

    Returns "" when the ambient (TPU) platform is live, else a suffix to
    append to the reported unit string."""
    for attempt in range(retries):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=probe_timeout, text=True,
            )
            if probe.returncode == 0:
                platform = probe.stdout.strip().splitlines()[-1]
                if platform != "cpu":
                    return ""
                break  # genuinely no accelerator registered: CPU box
            err = probe.stderr[-200:]
        except subprocess.TimeoutExpired:
            err = f"device claim timed out after {probe_timeout} s"
        print(f"[bench] device probe {attempt + 1}/{retries} failed: {err}",
              file=sys.stderr, flush=True)
        time.sleep(30)
    import jax

    jax.config.update("jax_platforms", "cpu")
    print("[bench] WARNING: accelerator unavailable; measuring on host CPU",
          file=sys.stderr, flush=True)
    return " [CPU FALLBACK - accelerator tunnel unavailable at run time]"
CACHE = Path(os.environ.get("TAPQIR_BENCH_CACHE", "/tmp/tapqir_bench"))

SIM_PARAMS = {
    "pi": 0.15, "width": 1.4, "gain": 7.0, "lamda": 0.15,
    "proximity": 0.2, "offset": 90.0, "height": 3000, "background": 150,
}


def _offset(n_offsets=61):
    """Realistic empirical offset histogram: 61 integer bins around 90."""
    centers = np.arange(90 - n_offsets // 2, 90 + n_offsets // 2 + 1,
                        dtype=np.float64)
    w = np.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    w /= w.sum()
    return centers, w


def build_dataset(name, sim_params, Nt=856, F=790, C=1, P=14, n_chunk=8):
    """Simulate an eLife-scale dataset in AOI chunks (bounded device memory),
    cached on disk per model."""
    from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, load, save
    from tapqir_tpu.utils.simulate import simulate

    cache = CACHE / name
    cache.mkdir(parents=True, exist_ok=True)
    if (cache / "data.tpqr").exists():
        try:
            data = load(cache)
        except Exception:  # truncated by a killed run: rebuild
            (cache / "data.tpqr").unlink()
        else:
            if data.Nt == Nt and data.F == F and data.C == C:
                return data, cache

    per = Nt // n_chunk
    chunks = [
        simulate(name, N=per, F=F, C=C, P=P, seed=i, params=sim_params)
        for i in range(n_chunk)
    ]
    centers, w = _offset()
    data = CosmosDataset(
        images=np.concatenate([d.images for d in chunks]),
        xy=np.concatenate([d.xy for d in chunks]),
        is_ontarget=np.concatenate([d.is_ontarget for d in chunks]),
        offset=OffsetData(centers, w),
        name=f"bench-elife-scale-{name}",
    )
    save(data, cache)
    return data, cache


def measure_exp_roofline(iters=200):
    """Measured idealized kernel inner loop: per element of a 4 MB block,
    32 INDEPENDENT fused exp(a*x + b_j) evaluations accumulated into one
    output (arithmetic intensity ~16 evals/byte - compute-bound, like the
    kernel's J-bin loop), x a jitted 50-iteration scan. Returns evals/s."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 1 << 22
    x0 = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    UNROLL, ITERS = 64, iters
    bs = [0.01 + 0.001 * j for j in range(UNROLL)]

    @jax.jit
    def trivial(x):
        return x.sum()

    @jax.jit
    def run(x):
        def body(y, _):
            acc = jnp.zeros_like(y)
            for j in range(UNROLL):
                acc = acc + jnp.exp(y * bs[j])
            return y + acc * 1e-9, ()
        y, _ = lax.scan(body, x, length=ITERS)
        return y.sum()

    def best_of(f, k=3):
        np.asarray(f(x0))  # compile
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # subtract the fixed dispatch/fetch latency (large through the axon
    # tunnel, ~25 ms) so the figure reflects device compute only
    latency = best_of(trivial)
    dt = max(best_of(run) - latency, 1e-6)
    return n * UNROLL * ITERS / dt


def bench_model(name, sim_params, C=1, Nt=856, F=790, fbatch=512,
                n_steps=200, m_kernel=4):
    import jax

    from tapqir_tpu.models import models

    data, cache = build_dataset(name, sim_params, Nt=Nt, F=F, C=C)
    model = models[name]()
    model.data = data
    model.path = cache
    model.run_path = cache / ".tapqir"
    model.init(lr=0.005, nbatch_size=10, fbatch_size=fbatch)

    key = jax.random.PRNGKey(0)
    # warmup/compile (same nsteps as the timed run -> single compilation)
    p, o, losses = model._run_chunk(model.params, model.opt_state, key, n_steps)
    np.asarray(losses)

    t0 = time.perf_counter()
    p, o, losses = model._run_chunk(p, o, jax.random.PRNGKey(1), n_steps)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    assert np.isfinite(losses).all(), f"non-finite losses in {name} benchmark"
    steps = n_steps / dt

    # per-step likelihood work: M configs x (n f C) images x EVP lane-padded
    # pixels x J offset bins (the Pallas kernel's eval count, pad included)
    P = data.P
    evp = -(-(P * P) // 128) * 128
    J = len(np.asarray(data.offset.samples))
    evals_per_step = m_kernel * 10 * fbatch * C * evp * J
    return {
        "steps_per_sec": round(steps, 2),
        "aoi_frames_per_sec": round(steps * 10 * fbatch),
        "bin_evals_per_sec": round(steps * evals_per_step),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    unit_suffix = _ensure_device_or_fallback()
    import jax

    # persistent compile cache: the bench workloads' XLA programs are
    # content-addressed, so repeat runs skip the multi-minute compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TAPQIR_COMPILE_CACHE", "/tmp/tapqir-jax-cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    def note(name, v):  # progress to stderr; the driver reads stdout JSON only
        print(f"[bench] {name}: {v:.2f} steps/s", file=sys.stderr, flush=True)

    # the timed window: 200 steps on an accelerator, 10 on the CPU fallback
    # (a CPU step costs seconds; the metric label carries the fallback marker)
    n_steps = 10 if unit_suffix else 200

    results = {}
    if which in ("all", "cosmos"):
        # m-configs through the kernel: 2^K = 4
        results["cosmos"] = bench_model(
            "cosmos", SIM_PARAMS, m_kernel=4, n_steps=n_steps
        )
        note("cosmos", results["cosmos"]["steps_per_sec"])
    if which in ("all", "hmm", "cosmos+hmm"):
        hmm_params = dict(SIM_PARAMS)
        del hmm_params["pi"]
        hmm_params.update(kon=0.2, koff=0.2)
        # full-F chain: every step sees all 790 frames of its AOI batch
        results["hmm"] = bench_model(
            "cosmos+hmm", hmm_params, fbatch=790, m_kernel=4, n_steps=n_steps
        )
        note("hmm", results["hmm"]["steps_per_sec"])
    if which in ("all", "crosstalk"):
        ct_params = dict(SIM_PARAMS)
        ct_params["alpha"] = [[0.85, 0.15], [0.1, 0.9]]
        # C=2 dyes: 2^(K*Q) = 16 global m-configs through the kernel
        results["crosstalk"] = bench_model(
            "crosstalk", ct_params, C=2, m_kernel=16, n_steps=n_steps
        )
        note("crosstalk", results["crosstalk"]["steps_per_sec"])

    roofline = measure_exp_roofline(iters=10 if unit_suffix else 200)
    print(f"[bench] exp roofline: {roofline/1e12:.2f} T evals/s",
          file=sys.stderr, flush=True)

    extra = {"exp_roofline_evals_per_sec": round(roofline)}
    for name, r in results.items():
        util = r["bin_evals_per_sec"] / roofline
        extra[f"{name}_steps_per_sec"] = r["steps_per_sec"]
        extra[f"{name}_aoi_frames_per_sec"] = r["aoi_frames_per_sec"]
        extra[f"{name}_exp_roofline_util"] = round(util, 4)
        extra[f"{name}_vs_assumed_baseline"] = round(
            r["steps_per_sec"] / REF_GPU_STEPS_PER_SEC, 2
        )

    headline = results.get("cosmos", next(iter(results.values())))
    print(
        json.dumps(
            {
                "metric": "cosmos_svi_steps_per_sec_elife_scale_1chip",
                "value": headline["steps_per_sec"],
                "unit": "steps/s (batch 10 AOIs x 512 frames, P14, 61 offset "
                        "bins; vs ASSUMED 10 steps/s reference-GPU anchor)"
                        + unit_suffix,
                "vs_baseline": round(
                    headline["steps_per_sec"] / REF_GPU_STEPS_PER_SEC, 2
                ),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
