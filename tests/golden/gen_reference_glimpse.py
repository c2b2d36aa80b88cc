"""Generate the glimpse-ingest golden by RUNNING THE REFERENCE'S OWN READER.

Provenance
----------
This script imports ``/root/reference/tapqir/imscroll/glimpse_reader.py`` —
the reference implementation's actual source, unmodified — and runs its
``read_glimpse`` end-to-end on the deterministic synthetic raw dataset from
``glimpse_synth.py`` (two glimpse binaries, fractional drift cumsum'd around
a mid-range aoiinfo frame, frame-range restriction, spot-picker labels,
offset trim + bin_hist thinning). The resulting dataset arrays are written
to ``reference_glimpse.npz``; ``tests/test_reference_goldens.py`` asserts
this repo's reader reproduces them exactly.

The reference's module chain needs pyro only for ``Vindex`` (fancy-indexing
helper, unused during ingest) and ``quantile`` (used for the plot axis
limits only); both are shimmed with behavior-equivalent one-liners. Every
golden number is produced by reference-authored lines.

Run:  python tests/golden/gen_reference_glimpse.py
(requires /root/reference; the committed npz is used by tests otherwise.)
"""

import sys
import tempfile
import types
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import torch  # noqa: E402

HERE = Path(__file__).resolve().parent
OUT = HERE / "reference_glimpse.npz"
sys.path.insert(0, str(HERE))

from glimpse_synth import synthesize  # noqa: E402


def _install_shims():
    """pyro.ops.{indexing,stats} shims sufficient for the ingest chain."""

    class Vindex:
        def __init__(self, tensor):
            self.tensor = tensor

        def __getitem__(self, idx):
            return self.tensor[idx]

    def quantile(x, probs, dim=0):
        return torch.quantile(x, torch.as_tensor(probs, dtype=x.dtype), dim=dim)

    pyro = types.ModuleType("pyro")
    ops = types.ModuleType("pyro.ops")
    indexing = types.ModuleType("pyro.ops.indexing")
    stats = types.ModuleType("pyro.ops.stats")
    indexing.Vindex = Vindex
    stats.quantile = quantile
    pyro.ops = ops
    ops.indexing = indexing
    ops.stats = stats
    for name, mod in (
        ("pyro", pyro),
        ("pyro.ops", ops),
        ("pyro.ops.indexing", indexing),
        ("pyro.ops.stats", stats),
    ):
        sys.modules[name] = mod


def main():
    _install_shims()
    sys.path.insert(0, "/root/reference")
    from tapqir.imscroll.glimpse_reader import read_glimpse

    # the reference targets numpy<2, where ``int16_array + 2**15`` promotes
    # to int64; numpy 2's strict promotion raises OverflowError instead.
    # Widen np.fromfile's result to int64 (value-neutral) so the reference's
    # own arithmetic runs unmodified.
    import tapqir.imscroll.glimpse_reader as ref_gr

    orig_fromfile = np.fromfile

    def widened_fromfile(*args, **kwargs):
        return orig_fromfile(*args, **kwargs).astype(np.int64)

    ref_gr.np.fromfile = widened_fromfile

    work = Path(tempfile.mkdtemp(prefix="ref_glimpse_"))
    cfg = synthesize(work)
    read_glimpse(work, progress_bar=lambda x: x, **cfg)

    saved = torch.load(work / "data.tpqr", weights_only=False)
    labels = saved["labels"]
    np.savez_compressed(
        OUT,
        images=saved["images"].numpy(),
        xy=saved["xy"].numpy(),
        is_ontarget=saved["is_ontarget"].numpy(),
        labels_z=labels["z"],
        labels_spotpicker=labels["spotpicker"],
        labels_aoi=labels["aoi"],
        labels_frame=labels["frame"],
        offset_samples=saved["offset_samples"].numpy(),
        offset_weights=saved["offset_weights"].numpy(),
        time1=saved["time1"].numpy(),
        ttb=saved["ttb"].numpy(),
    )
    print(f"wrote {OUT}")
    print(
        f"images {tuple(saved['images'].shape)} "
        f"sum={int(saved['images'].sum())} "
        f"offset bins {len(saved['offset_samples'])}"
    )


if __name__ == "__main__":
    main()
