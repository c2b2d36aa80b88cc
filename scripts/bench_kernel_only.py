"""Kernel-only throughput: the offset-gamma likelihood (fwd + bwd) alone at
each model's bench shapes, isolated from samplers/Adam/gathers.

Gives the denominator for the whole-step-vs-kernel proximity argument
(VERDICT r3 #1): kernel-only steps/s is the hard ceiling a step could reach
if everything but the likelihood kernel were free. Timed exactly like
bench.py: a jitted lax.scan of ``n_steps`` dependent iterations (the
inputs are nudged by their own gradients so nothing constant-folds).

Benches BOTH likelihood formulations:

* ``factored`` — the production path (models/*.py): per-spot deltas,
  config assembly inside the kernel (1 + Kf exps per pixel-offset);
* ``dense`` — the per-config-concentration kernel it replaced (kept as
  the general-concentration API), for the A/B record.

Run: python scripts/bench_kernel_only.py [n_steps]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _offsets(J):
    import jax.numpy as jnp

    centers = jnp.arange(60.0, 60.0 + J)
    w = jnp.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    return centers, jnp.log(w / w.sum())


def _time_scan(vg, x0, n_steps):
    import jax

    def run(c):
        def body(c, _):
            v, g = vg(c)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, c, g), v

        c, vs = jax.lax.scan(body, c, length=n_steps)
        return c, vs

    run_n = jax.jit(run)
    c, vs = run_n(x0)
    np.asarray(vs)  # compile + warm
    t0 = time.perf_counter()
    c, vs = run_n(x0)
    np.asarray(vs)
    return n_steps / (time.perf_counter() - t0)


def bench_dense(M, nfc, ev=196, evp=256, J=61, n_steps=200):
    import jax

    from tapqir_tpu.distributions.ksmogn import offset_gamma_log_prob_summed

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    centers, logits = _offsets(J)
    obs = jax.random.uniform(k1, (nfc, evp), minval=100.0, maxval=400.0)
    conc0 = jax.random.uniform(k2, (M, nfc, evp), minval=5.0, maxval=100.0)

    def loss(c):
        return offset_gamma_log_prob_summed(
            obs, c, 1.0 / 7.0, centers, logits, event_ndims=1, ev=ev
        ).sum()

    return _time_scan(jax.value_and_grad(loss), conc0, n_steps)


def bench_factored(Kf, nfc, ev=196, evp=256, J=61, n_steps=200):
    import jax

    from tapqir_tpu.distributions.ksmogn import offset_gamma_factored_summed

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    centers, logits = _offsets(J)
    obs = jax.random.uniform(k1, (nfc, evp), minval=100.0, maxval=400.0)
    base0 = jax.random.uniform(k2, (nfc,), minval=5.0, maxval=40.0)
    deltas0 = jax.random.uniform(k3, (Kf, nfc, evp), minval=0.0, maxval=80.0)
    mtab = np.stack(
        np.meshgrid(*([np.arange(2)] * Kf), indexing="ij"), -1
    ).reshape(-1, Kf)

    def loss(x):
        base, deltas = x
        return offset_gamma_factored_summed(
            obs, base, deltas, mtab, 1.0 / 7.0, centers, logits, ev=ev
        ).sum()

    return _time_scan(jax.value_and_grad(loss), (base0, deltas0), n_steps)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    shapes = {
        # (Kf spot factors -> M = 2^Kf configs) x (n * f * C kernel rows)
        "cosmos": (2, 10 * 512 * 1),
        "hmm": (2, 10 * 790 * 1),
        "crosstalk": (4, 10 * 512 * 2),
    }
    out = {}
    for name, (Kf, nfc) in shapes.items():
        # dense = the production likelihood path (models default)
        sps_d = bench_dense(1 << Kf, nfc, n_steps=n_steps)
        out[f"{name}_kernel_only_steps_per_sec"] = round(sps_d, 1)
        print(f"[kernel-only] {name} dense (production): {sps_d:.1f} steps/s",
              file=sys.stderr, flush=True)
        sps = bench_factored(Kf, nfc, n_steps=n_steps)
        out[f"{name}_factored_kernel_steps_per_sec"] = round(sps, 1)
        print(f"[kernel-only] {name} factored (alt):     {sps:.1f} steps/s",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
