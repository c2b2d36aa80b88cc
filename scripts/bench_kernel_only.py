"""Kernel-only throughput: the offset-gamma likelihood (fwd + bwd) alone at
each model's bench shapes, isolated from samplers/Adam/gathers.

Gives the denominator for the whole-step-vs-kernel proximity argument
(VERDICT r3 #1): kernel-only steps/s is the hard ceiling a step could reach
if everything but the likelihood kernel were free. Timed exactly like
bench.py: a jitted lax.scan of ``n_steps`` dependent iterations (the
concentration is nudged by its own gradient so nothing constant-folds).

Run: python scripts/bench_kernel_only.py [n_steps]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_kernel(M, nfc, ev=196, evp=256, J=61, n_steps=200):
    import jax
    import jax.numpy as jnp

    from tapqir_tpu.distributions.ksmogn import offset_gamma_log_prob_summed

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    centers = jnp.arange(60.0, 60.0 + J)
    w = jnp.exp(-0.5 * ((centers - 90.0) / 8.0) ** 2)
    logits = jnp.log(w / w.sum())
    obs = jax.random.uniform(k1, (nfc, evp), minval=100.0, maxval=400.0)
    conc0 = jax.random.uniform(k2, (M, nfc, evp), minval=5.0, maxval=100.0)
    inv_gain = 1.0 / 7.0

    def loss(c):
        lp = offset_gamma_log_prob_summed(
            obs, c, inv_gain, centers, logits, event_ndims=1, ev=ev
        )
        return lp.sum()

    vg = jax.value_and_grad(loss)

    def run(c, n):
        def body(c, _):
            v, g = vg(c)
            return c + 1e-9 * g, v

        c, vs = jax.lax.scan(body, c, length=n)
        return c, vs

    run_n = jax.jit(lambda c: run(c, n_steps))
    c, vs = run_n(conc0)
    np.asarray(vs)  # compile + warm
    t0 = time.perf_counter()
    c, vs = run_n(conc0)
    np.asarray(vs)
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    shapes = {
        # M m-configs through the kernel x (n AOIs * f frames * C channels)
        "cosmos": (4, 10 * 512 * 1),
        "hmm": (4, 10 * 790 * 1),
        "crosstalk": (16, 10 * 512 * 2),
    }
    out = {}
    for name, (M, nfc) in shapes.items():
        sps = bench_kernel(M, nfc, n_steps=n_steps)
        out[f"{name}_kernel_only_steps_per_sec"] = round(sps, 1)
        print(f"[kernel-only] {name}: {sps:.1f} steps/s", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
