"""Glimpse ingest: extract AOIs from raw microscopy videos.

Same file-format semantics as the reference reader
(tapqir/imscroll/glimpse_reader.py:22-501):

* ``header.mat`` (vid struct), driftlist (per-frame dx/dy deltas, made
  cumulative relative to the aoiinfo frame), aoiinfo ``.mat``/``.dat``,
  optional spot-picker label intervals;
* raw frames are big-endian int16 read from ``{filenumber}.glimpse`` at the
  per-frame byte offset, unsigned-shifted by 2^15;
* P x P AOI crops with banker's-rounded drift shifts; sub-pixel target
  coordinates stored per frame;
* empirical offset histogram from a dark FOV corner, min-floor padding,
  99.5 percentile trim, and ``bin_hist`` thinning.

The implementation is structured differently from the reference: parsing is
decomposed into per-file helpers, cumulative drift is computed in pure
numpy, frames are decoded in batches grouped by glimpse file (through the
optional C++ decoder in ``tapqir_tpu/csrc`` when built), and the per-frame
AOI crop is one vectorized gather over all AOIs.
"""

import logging
import os
from pathlib import Path

import numpy as np
import pandas as pd
from scipy.io import loadmat

from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, save

logger = logging.getLogger(__name__)

__all__ = ["bin_hist", "GlimpseDataset", "read_glimpse"]

AOI_COLUMNS = ["frame", "ave", "y", "x", "pixnum", "aoi"]

# spot-picker interval codes (Friedman-Gelles): absent vs present
_SPOTPICKER_ABSENT = (-2.0, 0.0, 2.0)
_SPOTPICKER_PRESENT = (-3.0, 1.0, 3.0)


def bin_hist(samples: np.ndarray, weights: np.ndarray, s: int):
    """Thin an offset histogram: keep the first sample intact, then merge
    every ``s`` consecutive samples into one bin represented by its middle
    sample (reference: glimpse_reader.py:22-37)."""
    samples = np.asarray(samples)
    weights = np.asarray(weights)
    tail_s, tail_w = samples[1:], weights[1:]
    if len(tail_s) == 0:
        return samples.astype(int), np.asarray(weights, dtype=float)
    edges = np.arange(0, len(tail_s), s)
    sizes = np.diff(np.append(edges, len(tail_s)))
    representatives = tail_s[edges + sizes // 2]
    merged_w = np.add.reduceat(np.asarray(tail_w, dtype=float), edges)
    new_samples = np.concatenate([samples[:1], representatives]).astype(int)
    new_weights = np.concatenate([np.asarray(weights[:1], float), merged_w])
    return new_samples, new_weights


def _load_header(folder):
    """``header.mat`` holds a MATLAB ``vid`` struct; flatten it to a dict."""
    record = loadmat(Path(folder) / "header.mat")["vid"][0, 0]
    return {name: np.squeeze(record[name]) for name in record.dtype.names}


def _load_aoi_table(path) -> pd.DataFrame:
    """Load AOI locations from any of the three formats in the wild:
    ``aoiinfo2`` matrix in a .mat, an ``aoifits`` struct wrapping it, or a
    plain-text export. Returns a DataFrame indexed by AOI id with 0-based
    (x, y) coordinates."""
    try:
        mat = loadmat(path)
    except ValueError:
        rows = np.loadtxt(path)  # plain-text .dat export
    else:
        if "aoiinfo2" in mat:
            rows = mat["aoiinfo2"]
        elif "aoifits" in mat:
            rows = mat["aoifits"]["aoiinfo2"][0, 0]
        else:
            raise ValueError(
                f"{path}: no aoiinfo2/aoifits variable in .mat file"
            )
    table = pd.DataFrame(rows, columns=AOI_COLUMNS)
    table = table.astype({"aoi": int}).set_index("aoi")
    table[["x", "y"]] -= 1.0  # MATLAB 1-based -> python 0-based pixels
    return table


def _cumulative_drift(deltas: np.ndarray, anchor_pos: int) -> np.ndarray:
    """Convert per-frame drift deltas to drift relative to the anchor frame.

    Frames after the anchor accumulate forward; frames before it accumulate
    backward (negated). The anchor row itself keeps its raw delta, matching
    the reference's slicing arithmetic (glimpse_reader.py:102-111).
    """
    cum = np.empty_like(deltas)
    cum[anchor_pos] = deltas[anchor_pos]
    cum[anchor_pos + 1 :] = np.cumsum(deltas[anchor_pos + 1 :], axis=0)
    if anchor_pos > 0:
        cum[:anchor_pos] = -np.cumsum(deltas[anchor_pos:0:-1], axis=0)[::-1]
    return cum


def _decode_spotpicker_labels(path, aoi_ids, frame_ids):
    """Decode spot-picker ``Intervals`` into a structured (N, F) label array
    with aoi / frame / z / spotpicker fields (reference:
    glimpse_reader.py:118-151)."""
    intervals = loadmat(path)["Intervals"]["CumulativeIntervalArray"][0, 0]
    aoi_ids = np.asarray(aoi_ids)
    frame_ids = np.asarray(frame_ids)
    row_of = {int(a): i for i, a in enumerate(aoi_ids)}
    z = np.zeros((len(aoi_ids), len(frame_ids)))
    for interval in intervals:
        code, start, stop, aoi = (
            float(interval[0]),
            int(interval[1]),
            int(interval[2]),
            int(interval[-1]),
        )
        row = row_of.get(aoi)
        if row is None:
            continue
        in_range = (frame_ids >= start) & (frame_ids <= stop)
        if code in _SPOTPICKER_ABSENT:
            z[row, in_range] = 0
        elif code in _SPOTPICKER_PRESENT:
            z[row, in_range] = 1
    labels = np.zeros(
        z.shape,
        dtype=[("aoi", int), ("frame", int), ("z", bool), ("spotpicker", float)],
    )
    labels["aoi"] = aoi_ids[:, None]
    labels["frame"] = frame_ids
    labels["spotpicker"] = z
    labels["z"] = z
    return labels


class GlimpseDataset:
    """Parses header, aoiinfo, driftlist, and optional label intervals
    (reference: glimpse_reader.py:40-206).

    Config keys (hyphenated, as persisted in config.yaml): glimpse-folder,
    ontarget-aoiinfo, offtarget-aoiinfo, use-offtarget, driftlist,
    frame-range, frame-start, frame-end, labels, ontarget-labels,
    offtarget-labels, offset-x, offset-y, name.
    """

    def __init__(self, c=0, **kwargs):
        dtypes = ["ontarget"] + (
            ["offtarget"] if kwargs.get("use-offtarget") else []
        )
        header = _load_header(kwargs["glimpse-folder"])

        aoi_df = {
            dtype: _load_aoi_table(kwargs[f"{dtype}-aoiinfo"]) for dtype in dtypes
        }

        raw_drift = loadmat(kwargs["driftlist"])["driftlist"][:, :3]
        frame_index = raw_drift[:, 0].astype(int)
        # drift relative to the frame the AOIs were picked on
        aoiinfo_frame = int(aoi_df["ontarget"]["frame"].iloc[0])
        anchor_pos = int(np.nonzero(frame_index == aoiinfo_frame)[0][0])
        # driftlist columns are (frame, dy, dx)
        cum_dydx = _cumulative_drift(raw_drift[:, 1:3], anchor_pos)
        drift_df = pd.DataFrame(
            {
                "dy": cum_dydx[:, 0],
                "dx": cum_dydx[:, 1],
                "ttb": np.atleast_1d(header["ttb"]),
            },
            index=pd.Index(frame_index, name="frame"),
        )

        if kwargs.get("frame-range"):
            drift_df = drift_df.loc[
                int(kwargs["frame-start"]) : int(kwargs["frame-end"])
            ]

        labels = {dtype: None for dtype in dtypes}
        if kwargs.get("labels"):
            for dtype in dtypes:
                if kwargs.get(f"{dtype}-labels") is not None:
                    labels[dtype] = _decode_spotpicker_labels(
                        kwargs[f"{dtype}-labels"],
                        aoi_df[dtype].index.values,
                        drift_df.index.values,
                    )

        self.height, self.width = int(header["height"]), int(header["width"])
        self.config = kwargs
        self.header = header
        self.dtypes = dtypes
        self.aoiinfo = aoi_df
        self.cumdrift = drift_df
        self.labels = labels
        self.name = kwargs.get("name")
        self.c = c
        self.offset_x = kwargs["offset-x"]
        self.offset_y = kwargs["offset-y"]

    def __len__(self):
        return self.F

    def read_frames(self, frames) -> np.ndarray:
        """Decode a batch of raw frames (1-based frame numbers), grouped by
        glimpse file so each file is opened once. Returns (B, H, W) int32
        with the 2^15 unsign shift applied."""
        frames = np.atleast_1d(np.asarray(frames, dtype=int))
        file_numbers = np.atleast_1d(self.header["filenumber"])[frames - 1]
        byte_offsets = np.atleast_1d(self.header["offset"])[frames - 1].astype(
            np.int64
        )
        out = np.empty((len(frames), self.height, self.width), dtype=np.int32)
        folder = Path(self.config["glimpse-folder"])
        for number in np.unique(file_numbers):
            in_file = file_numbers == number
            glimpse_path = folder / f"{number}.glimpse"
            decoded = self._decode_file(glimpse_path, byte_offsets[in_file])
            out[in_file] = decoded
        return out

    def _decode_file(self, glimpse_path, offsets) -> np.ndarray:
        """All requested frames of one glimpse file, shifted to unsigned."""
        try:
            from tapqir_tpu.csrc import glimpse_native

            return glimpse_native.read_frames(
                str(glimpse_path), offsets.tolist(), self.height, self.width
            )
        except Exception:
            pixels = self.height * self.width
            out = np.empty((len(offsets), self.height, self.width), np.int32)
            with open(glimpse_path, "rb") as fid:
                for i, offset in enumerate(offsets):
                    fid.seek(int(offset))
                    raw = np.fromfile(fid, dtype=">i2", count=pixels)
                    out[i] = raw.reshape(self.height, self.width)
            return out + 2**15

    def __getitem__(self, key):
        """Read raw frame(s) by 1-based frame number
        (reference: glimpse_reader.py:168-186)."""
        if isinstance(key, slice):
            step = 1 if key.step is None else key.step
            return self.read_frames(np.arange(key.start, key.stop, step))
        return self.read_frames(key)[0]

    @property
    def N(self):
        return len(self.aoiinfo["ontarget"])

    @property
    def Nc(self):
        return len(self.aoiinfo["offtarget"]) if "offtarget" in self.dtypes else 0

    @property
    def F(self):
        return len(self.cumdrift)

    def __repr__(self):
        return f"{self.__class__.__name__}(N={self.N}, Nc={self.Nc}, F={self.F})"

    def plot(self, dtypes, P, n=None, f=0, save=False, path=None, ax=None,
             item=None, title=None):
        """FOV plot with AOI rectangles (reference: glimpse_reader.py:208-301).
        Best-effort; never fails the pipeline."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from matplotlib.patches import Rectangle

            item = {} if item is None else item
            colors = {"ontarget": "#AA3377", "offtarget": "#CCBB44"}
            if ax is None:
                fig = plt.figure(figsize=(10, 10 * self.height / self.width))
                ax = fig.add_subplot(1, 1, 1)
            frame = self.cumdrift.index[f]
            fov = self[frame]
            vmin, vmax = np.percentile(fov, 1), np.percentile(fov, 99)
            ax.imshow(fov, vmin=vmin, vmax=vmax, cmap="gray")
            for dtype in dtypes:
                if dtype in ("ontarget", "offtarget"):
                    for aoi in self.aoiinfo[dtype].index:
                        y_pos = (
                            round(
                                self.aoiinfo[dtype].at[aoi, "y"]
                                + self.cumdrift.at[frame, "dy"]
                                - 0.5 * (P - 1)
                            )
                            - 0.5
                        )
                        x_pos = (
                            round(
                                self.aoiinfo[dtype].at[aoi, "x"]
                                + self.cumdrift.at[frame, "dx"]
                                - 0.5 * (P - 1)
                            )
                            - 0.5
                        )
                        ax.add_patch(
                            Rectangle(
                                (x_pos, y_pos), P, P,
                                edgecolor=colors[dtype], lw=1, facecolor="none",
                            )
                        )
                elif dtype == "offset":
                    ax.add_patch(
                        Rectangle(
                            (self.offset_x, self.offset_y), P, P,
                            edgecolor="#CCBB44", lw=1, facecolor="none",
                        )
                    )
            ax.set_title(title or f"AOI {n}, Frame {f}", fontsize=9)
            if save and path is not None:
                plt.savefig(
                    Path(path) / f"{dtypes[0]}-channel{self.c}.png", dpi=300
                )
            plt.close("all")
        except Exception as err:  # pragma: no cover
            logger.warning(f"FOV plotting failed: {err}")


def _crop_all_aois(img, raw_xy_f, P):
    """Vectorized P x P crops for all AOIs of one frame.

    :param img: (H, W) frame.
    :param raw_xy_f: (N, 2) drift-corrected float target positions (x, y).
    :return: crops (N, P, P) and sub-pixel targets (N, 2).
    """
    # banker's rounding to match the reference's python round()
    shift = np.round(raw_xy_f - 0.5 * (P - 1)).astype(int)  # (N, 2) x, y
    rows = shift[:, 1][:, None, None] + np.arange(P)[None, :, None]
    cols = shift[:, 0][:, None, None] + np.arange(P)[None, None, :]
    crops = img[rows, cols]
    targets = raw_xy_f - shift
    return crops, targets


# frames decoded per batch in read_glimpse; bounds resident raw-frame memory
# at FRAME_CHUNK * H * W * 4 bytes (e.g. 64 * 512 * 512 * 4 = 64 MiB)
FRAME_CHUNK = 64


def read_glimpse(path, progress_bar=None, **kwargs):
    """Extract AOIs from glimpse files into ``data.tpqr``
    (reference: glimpse_reader.py:304-501)."""
    if progress_bar is None:
        progress_bar = lambda it: it  # noqa: E731
    path = Path(path)
    P = kwargs.pop("P")
    C = kwargs.pop("num-channels")
    name = kwargs.pop("dataset", None)
    channels = kwargs.pop("channels")
    offset_P = kwargs.pop("offset-P")
    bin_size = kwargs.pop("bin-size")

    offset_counts = {}
    offset_medians = []
    data = {}
    target_xy = {}
    labels = {}
    time1 = []
    ttb = []
    for c in range(C):
        logger.info(f"Channel #{c} ({channels[c]['name']})")
        glimpse = GlimpseDataset(**kwargs, **channels[c], c=c)

        time1.append(float(glimpse.header["time1"]))
        ttb.append(glimpse.cumdrift["ttb"].values)
        raw_target_xy = {}
        for dtype in glimpse.dtypes:
            N = len(glimpse.aoiinfo[dtype])
            F = len(glimpse.cumdrift)
            raw_target_xy[dtype] = (
                np.expand_dims(glimpse.aoiinfo[dtype][["x", "y"]].values, axis=1)
                + glimpse.cumdrift[["dx", "dy"]].values
            )  # (N, F, 2)
            target_xy.setdefault(dtype, []).append(np.zeros((N, F, 2)))
            data.setdefault(dtype, []).append(np.zeros((N, F, P, P), dtype=int))
            labels.setdefault(dtype, []).append(glimpse.labels[dtype])
            if not os.environ.get("CI"):
                glimpse.plot(
                    (dtype,), P, path=path, save=True,
                    title=f"{dtype} locations for channel {c}",
                )
        if not os.environ.get("CI"):
            glimpse.plot(
                ("offset",), offset_P, path=path, save=True,
                title=f"offset location for channel {c}",
            )

        frame_numbers = glimpse.cumdrift.index.to_numpy()
        frame_iter = iter(progress_bar(frame_numbers))
        for chunk_start in range(0, len(frame_numbers), FRAME_CHUNK):
            chunk = frame_numbers[chunk_start : chunk_start + FRAME_CHUNK]
            imgs = glimpse.read_frames(chunk)  # batch decode, one open/file
            for b in range(len(chunk)):
                next(frame_iter, None)  # drive the progress bar
                f = chunk_start + b
                img = imgs[b]
                offset_img = img[
                    glimpse.offset_y : glimpse.offset_y + offset_P,
                    glimpse.offset_x : glimpse.offset_x + offset_P,
                ]
                offset_medians.append(np.median(offset_img))
                values, counts = np.unique(offset_img, return_counts=True)
                for value, count in zip(values, counts):
                    offset_counts[int(value)] = (
                        offset_counts.get(int(value), 0) + int(count)
                    )
                for dtype in glimpse.dtypes:
                    crops, targets = _crop_all_aois(
                        img, raw_target_xy[dtype][:, f], P
                    )
                    data[dtype][c][:, f] = crops
                    target_xy[dtype][c][:, f] = targets

        for dtype in glimpse.dtypes:
            assert (target_xy[dtype][c] > 0.5 * P - 1).all()
            assert (target_xy[dtype][c] < 0.5 * P).all()

    logger.info("Processing extracted AOIs ...")
    min_data = np.inf
    for dtype in data.keys():
        data[dtype] = np.stack(data[dtype], -3)  # (N, F, C, P, P)
        target_xy[dtype] = np.stack(target_xy[dtype], -2)  # (N, F, C, 2)
        min_data = min(min_data, data[dtype].min())
        if any(label is None for label in labels[dtype]):
            labels[dtype] = None
        else:
            labels[dtype] = np.stack(labels[dtype], -1)

    # offset histogram post-processing (reference: glimpse_reader.py:404-424)
    offset_samples = np.array(sorted(offset_counts))
    offset_weights = np.array(
        [offset_counts[s] for s in offset_samples], dtype=float
    )
    if min_data <= offset_samples[0]:
        offset_samples = np.insert(offset_samples, 0, min_data - 1)
        offset_weights = np.insert(offset_weights, 0, 1)
    offset_weights = offset_weights / offset_weights.sum()
    high_mask = offset_weights.cumsum() > 0.995
    high_weights = offset_weights[high_mask].sum()
    offset_samples = offset_samples[~high_mask]
    offset_weights = offset_weights[~high_mask]
    offset_weights[-1] += high_weights
    offset_samples, offset_weights = bin_hist(offset_samples, offset_weights, bin_size)

    dtypes = list(data.keys())
    is_ontarget = np.concatenate(
        [np.full(data[dtype].shape[0], dtype == "ontarget", bool) for dtype in dtypes]
    )
    images = np.concatenate([data[dtype] for dtype in dtypes], 0)
    xy = np.concatenate([target_xy[dtype] for dtype in dtypes], 0)
    if all(labels[dtype] is None for dtype in dtypes):
        labels_all = None
    else:
        labels_all = np.concatenate(
            [labels[dtype] for dtype in dtypes if labels[dtype] is not None], 0
        )

    dataset = CosmosDataset(
        images=images,
        xy=xy,
        is_ontarget=is_ontarget,
        labels=labels_all,
        offset=OffsetData(
            np.asarray(offset_samples, np.float64),
            np.asarray(offset_weights, np.float64),
        ),
        time1=np.asarray(time1),
        ttb=np.asarray(ttb).T,
        name=name,
        channels=tuple(channel["name"] for channel in channels),
    )
    logger.info(
        f"Dataset: N={dataset.N} on-target AOIs, Nc={dataset.Nc} off-target AOIs, "
        f"F={dataset.F} frames, C={dataset.C} channels, P={dataset.P} pixels"
    )
    save(dataset, path)

    if not os.environ.get("CI"):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(3, 3))
            plt.bar(offset_samples, offset_weights, alpha=0.5, label="Offset")
            for c in range(C):
                vals, counts = np.unique(images[:, :, c], return_counts=True)
                plt.bar(vals, counts / counts.sum(), alpha=0.5, label=f"Channel {c}")
            plt.title("Empirical Distribution")
            plt.xlim(offset_samples.min(), float(dataset.vmax.max()))
            plt.legend()
            plt.tight_layout()
            plt.savefig(path / "offset-distribution.png", dpi=300)

            plt.figure(figsize=(5, 3))
            plt.plot(offset_medians, label="Offset Median")
            plt.title("Offset drift")
            plt.ylim(offset_samples.min(), offset_samples.max())
            plt.legend()
            plt.tight_layout()
            plt.savefig(path / "offset-medians.png", dpi=300)
            plt.close("all")
        except Exception as err:  # pragma: no cover
            logger.warning(f"QC plotting failed: {err}")
    return dataset
