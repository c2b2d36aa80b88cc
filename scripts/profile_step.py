"""Profile one model's SVI step on the ambient device and print the top XLA
ops by device time.

Usage: python scripts/profile_step.py [cosmos|crosstalk|cosmos+hmm] [n_steps]

Traces ``model._run_chunk`` (the jitted lax.scan of SVI steps) with
jax.profiler and aggregates the XPlane "XLA Ops" line directly - the
tensorboard_plugin_profile converter is broken against the installed TF, so
the proto is parsed by hand (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).
The outer %while (the whole scan) is excluded; per-op durations are averaged
over the scanned steps.
"""

import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build(name, fbatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from tapqir_tpu.models import models

    sim = dict(bench.SIM_PARAMS)
    C = 1
    if name == "crosstalk":
        sim["alpha"] = [[0.85, 0.15], [0.1, 0.9]]
        C = 2
    elif name == "cosmos+hmm":
        del sim["pi"]
        sim.update(kon=0.2, koff=0.2)
    data, cache = bench.build_dataset(name, sim, C=C)
    model = models[name]()
    model.data = data
    model.path = cache
    model.run_path = cache / ".tapqir"
    model.init(lr=0.005, nbatch_size=10, fbatch_size=fbatch)
    return model


def collect(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = list(Path(trace_dir).rglob("*.xplane.pb"))
    assert files, f"no xplane in {trace_dir}"
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(files[0].read_bytes())

    totals = defaultdict(float)
    planes = [p for p in xspace.planes if "tpu" in p.name.lower()]
    if not planes:  # CPU run: the host plane carries the XLA ops line
        planes = [p for p in xspace.planes if "device" in p.name.lower()]
    for plane in planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "?")
                totals[nm] += ev.duration_ps / 1e9  # ms
    return totals


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "crosstalk"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    fbatch = 790 if name == "cosmos+hmm" else 512

    import jax

    model = build(name, fbatch)
    key = jax.random.PRNGKey(0)
    p, o, losses = model._run_chunk(
        model.params, model.opt_state, key, n_steps
    )
    np.asarray(losses)  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix=f"tapqir_prof_{name.replace('+','_')}_")
    with jax.profiler.trace(trace_dir):
        p, o, losses = model._run_chunk(p, o, jax.random.PRNGKey(1), n_steps)
        np.asarray(losses)

    totals = collect(trace_dir)
    whole = {k: v for k, v in totals.items() if not k.startswith("while")}
    scan_total = sum(whole.values())
    print(f"[{name}] {n_steps} steps; device ops total "
          f"{scan_total:.1f} ms -> {scan_total / n_steps:.3f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for k, v in sorted(whole.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v / n_steps:9.4f}  {100 * v / scan_total:5.1f}  {k[:240]}")
    print(f"trace: {trace_dir}")


if __name__ == "__main__":
    main()
