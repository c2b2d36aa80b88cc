"""Deterministic synthetic raw-glimpse inputs for ingest parity testing.

Shared by ``gen_reference_glimpse.py`` (which runs the REFERENCE's
``read_glimpse`` on these inputs to produce the committed golden npz) and
``tests/test_reference_goldens.py`` (which runs THIS repo's reader on the
same inputs and asserts byte-identical datasets).

The inputs intentionally exercise every parsing convention the reference
implements (reference: tapqir/imscroll/glimpse_reader.py:55-186,304-424):

* two ``.glimpse`` binary files with per-frame file numbers / byte offsets;
* big-endian int16 storage with the +2**15 unsign shift;
* fractional AOI coordinates (MATLAB 1-based, sub-pixel);
* a driftlist of per-frame INCREMENTS cumsum'd around the aoiinfo frame
  (frame 5 of 12, so both the forward and backward cumsum branches run);
* a frame-range restriction (frames 2..11);
* spot-picker label Intervals for both on- and off-target AOIs;
* offset-histogram construction incl. the min-data insertion branch,
  the upper-0.5-percentile trim, and ``bin_hist`` thinning (bin size 2).
"""

from pathlib import Path

import numpy as np
from scipy.io import savemat

H, W = 48, 64
F_TOTAL = 12
P = 14
AOI_ON = [(20.3, 12.4), (30.7, 40.2), (14.1, 52.6)]  # (y, x), 0-based frac
AOI_OFF = [(10.2, 30.8), (36.4, 18.3)]
AOIINFO_FRAME = 5  # drift increments cumsum'd around this frame
FRAME_START, FRAME_END = 2, 11
OFFSET_X, OFFSET_Y, OFFSET_P = 2, 36, 10
BIN_SIZE = 2


def synthesize(root: Path) -> dict:
    """Write all raw input files under ``root``; return the read_glimpse
    config (reference kwarg naming)."""
    root = Path(root)
    gdir = root / "glimpse"
    gdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260818)

    # background ~88..96 with a few hot pixels so the 99.5% offset trim has
    # something to remove; bright 7x7 squares at the on-target AOI centres
    frames = rng.integers(88, 97, size=(F_TOTAL, H, W))
    hot = rng.random((F_TOTAL, H, W)) > 0.998
    frames = np.where(hot, frames + rng.integers(40, 200, frames.shape), frames)
    for f in range(F_TOTAL):
        for y, x in AOI_ON:
            yi, xi = int(round(y)), int(round(x))
            frames[f, yi - 3 : yi + 4, xi - 3 : xi + 4] += 420

    # two glimpse files: frames 0-6 in 0.glimpse, 7-11 in 1.glimpse
    filenumbers, offsets = [], []
    split = 7
    for fileno, fr in ((0, range(0, split)), (1, range(split, F_TOTAL))):
        with open(gdir / f"{fileno}.glimpse", "wb") as fh:
            for f in fr:
                filenumbers.append(fileno)
                offsets.append(fh.tell())
                (frames[f] - 2**15).astype(">i2").tofile(fh)

    savemat(
        gdir / "header.mat",
        {
            "vid": {
                "height": H,
                "width": W,
                "nframes": F_TOTAL,
                "filenumber": np.asarray(filenumbers),
                "offset": np.asarray(offsets),
                "ttb": np.arange(F_TOTAL) * 100.0 + 17.0,
                "time1": 12345.5,
            }
        },
    )

    # driftlist: [frame(1-based), dy, dx] PER-FRAME INCREMENTS, fractional
    drift = np.zeros((F_TOTAL, 3))
    drift[:, 0] = np.arange(1, F_TOTAL + 1)
    drift[:, 1] = rng.uniform(-0.12, 0.12, F_TOTAL).round(3)  # dy
    drift[:, 2] = rng.uniform(-0.12, 0.12, F_TOTAL).round(3)  # dx
    savemat(root / "driftlist.mat", {"driftlist": drift})

    def aoiinfo(centers):
        # [frame, ave, y, x, pixnum, aoi] with MATLAB 1-based coords
        return np.array(
            [
                [AOIINFO_FRAME, 1.0, y + 1, x + 1, 7, i + 1]
                for i, (y, x) in enumerate(centers)
            ],
            float,
        )

    savemat(root / "aoi_on.mat", {"aoiinfo2": aoiinfo(AOI_ON)})
    savemat(root / "aoi_off.mat", {"aoiinfo2": aoiinfo(AOI_OFF)})

    # spot-picker label intervals: rows [type, start, end, pad, pad, pad, aoi]
    # types -3/1/3 mark bound (z=1), -2/0/2 unbound (z=0)
    on_intervals = np.array(
        [
            [-2.0, 1, 3, 0, 0, 0, 1],
            [1.0, 4, 8, 0, 0, 0, 1],
            [2.0, 9, 12, 0, 0, 0, 1],
            [-3.0, 1, 6, 0, 0, 0, 2],
            [0.0, 7, 12, 0, 0, 0, 2],
            [-2.0, 1, 12, 0, 0, 0, 3],
        ]
    )
    off_intervals = np.array(
        [
            [-2.0, 1, 12, 0, 0, 0, 1],
            [-2.0, 1, 5, 0, 0, 0, 2],
            [3.0, 6, 12, 0, 0, 0, 2],
        ]
    )
    savemat(
        root / "labels_on.mat",
        {"Intervals": {"CumulativeIntervalArray": on_intervals}},
    )
    savemat(
        root / "labels_off.mat",
        {"Intervals": {"CumulativeIntervalArray": off_intervals}},
    )

    return {
        "P": P,
        "num-channels": 1,
        "dataset": "parity-synth",
        "offset-P": OFFSET_P,
        "bin-size": BIN_SIZE,
        "frame-range": True,
        "frame-start": FRAME_START,
        "frame-end": FRAME_END,
        "use-offtarget": True,
        "labels": True,
        "channels": [
            {
                "name": "blue",
                "glimpse-folder": str(gdir),
                "driftlist": str(root / "driftlist.mat"),
                "ontarget-aoiinfo": str(root / "aoi_on.mat"),
                "offtarget-aoiinfo": str(root / "aoi_off.mat"),
                "ontarget-labels": str(root / "labels_on.mat"),
                "offtarget-labels": str(root / "labels_off.mat"),
            }
        ],
        "offset-x": OFFSET_X,
        "offset-y": OFFSET_Y,
    }
