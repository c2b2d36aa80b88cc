"""Glimpse ingest: extract AOIs from raw microscopy videos.

Port of the reference reader (tapqir/imscroll/glimpse_reader.py:22-501) with
identical semantics:

* ``header.mat`` (vid struct), driftlist (cumulative dx/dy around the
  aoiinfo frame), aoiinfo ``.mat``/``.dat``, optional spot-picker label
  intervals;
* raw frames are big-endian int16 read from ``{filenumber}.glimpse`` at the
  per-frame byte offset, unsigned-shifted by 2^15;
* P x P AOI crops with banker's-rounded drift shifts; sub-pixel target
  coordinates stored per frame;
* empirical offset histogram from a dark FOV corner, min-floor padding,
  99.5 percentile trim, and ``bin_hist`` thinning.

Performance difference: the per-frame/per-AOI Python crop loop of the
reference (glimpse_reader.py:357-381) is replaced by one vectorized numpy
gather per frame over all AOIs; the optional C++ frame decoder
(tapqir_tpu/csrc) accelerates the raw IO when built.
"""

import logging
import os
from collections import OrderedDict, defaultdict
from pathlib import Path

import numpy as np
import pandas as pd
from scipy.io import loadmat

from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, save

logger = logging.getLogger(__name__)

__all__ = ["bin_hist", "GlimpseDataset", "read_glimpse"]


def bin_hist(samples: np.ndarray, weights: np.ndarray, s: int):
    """Thin an offset histogram by binning every ``s`` consecutive samples
    (reference: glimpse_reader.py:22-37). The first sample is kept intact."""
    samples = np.asarray(samples)
    weights = np.asarray(weights)
    q, r = divmod(len(samples) - 1, s)
    n = 1 + q + int(bool(r))
    new_samples = np.zeros(n, dtype=int)
    new_weights = np.zeros(n)
    new_samples[0] = samples[0]
    new_weights[0] = weights[0]
    new_samples[1 : 1 + q] = samples[1 + s // 2 : 1 + q * s : s]
    for i in range(s):
        new_weights[1 : 1 + q] += weights[1 + i : 1 + q * s : s]
    if r:
        new_samples[-1] = samples[1 + q * s + r // 2]
        new_weights[-1] = weights[1 + q * s :].sum()
    return new_samples, new_weights


class GlimpseDataset:
    """Parses header, aoiinfo, driftlist, and optional label intervals
    (reference: glimpse_reader.py:40-206).

    Config keys (hyphenated, as persisted in config.yaml): glimpse-folder,
    ontarget-aoiinfo, offtarget-aoiinfo, use-offtarget, driftlist,
    frame-range, frame-start, frame-end, labels, ontarget-labels,
    offtarget-labels, offset-x, offset-y, name.
    """

    def __init__(self, c=0, **kwargs):
        dtypes = ["ontarget"]
        if kwargs.get("use-offtarget"):
            dtypes.append("offtarget")

        mat_header = loadmat(Path(kwargs["glimpse-folder"]) / "header.mat")
        header = {}
        for i, dt in enumerate(mat_header["vid"].dtype.names):
            header[dt] = np.squeeze(mat_header["vid"][0, 0][i])

        drift_mat = loadmat(kwargs["driftlist"])
        drift_df = pd.DataFrame(
            drift_mat["driftlist"][:, :3], columns=["frame", "dy", "dx"]
        )
        drift_df = drift_df.astype({"frame": int}).set_index("frame")
        drift_df["ttb"] = header["ttb"]

        aoi_df = {}
        for dtype in dtypes:
            try:
                aoi_mat = loadmat(kwargs[f"{dtype}-aoiinfo"])
            except ValueError:
                aoi_mat = np.loadtxt(kwargs[f"{dtype}-aoiinfo"])
            try:
                aoi_df[dtype] = pd.DataFrame(
                    aoi_mat["aoiinfo2"],
                    columns=["frame", "ave", "y", "x", "pixnum", "aoi"],
                )
            except KeyError:
                aoi_df[dtype] = pd.DataFrame(
                    aoi_mat["aoifits"]["aoiinfo2"][0, 0],
                    columns=["frame", "ave", "y", "x", "pixnum", "aoi"],
                )
            except (IndexError, TypeError):
                aoi_df[dtype] = pd.DataFrame(
                    aoi_mat, columns=["frame", "ave", "y", "x", "pixnum", "aoi"]
                )
            aoi_df[dtype] = aoi_df[dtype].astype({"aoi": int}).set_index("aoi")
            # matlab -> python indexing
            aoi_df[dtype]["x"] = aoi_df[dtype]["x"] - 1
            aoi_df[dtype]["y"] = aoi_df[dtype]["y"] - 1

        # cumulative drift relative to the aoiinfo frame
        # (reference: glimpse_reader.py:102-111)
        aoiinfo_frame = int(aoi_df["ontarget"].at[aoi_df["ontarget"].index[0], "frame"])
        drift_df.loc[aoiinfo_frame + 1 :, ["dx", "dy"]] = (
            drift_df.loc[aoiinfo_frame + 1 :, ["dx", "dy"]].cumsum(axis=0).values
        )
        drift_df.loc[aoiinfo_frame - 1 :: -1, ["dx", "dy"]] = (
            (-drift_df.loc[aoiinfo_frame : drift_df.index[1] : -1, ["dx", "dy"]])
            .cumsum(axis=0)
            .values
        )

        if kwargs.get("frame-range"):
            f1 = int(kwargs["frame-start"])
            f2 = int(kwargs["frame-end"])
            drift_df = drift_df.loc[f1:f2]

        labels = defaultdict(lambda: None)
        for dtype in dtypes:
            if kwargs.get("labels") and kwargs.get(f"{dtype}-labels") is not None:
                labels_mat = loadmat(kwargs[f"{dtype}-labels"])
                labels[dtype] = np.zeros(
                    (len(aoi_df[dtype]), len(drift_df)),
                    dtype=[
                        ("aoi", int),
                        ("frame", int),
                        ("z", bool),
                        ("spotpicker", float),
                    ],
                )
                labels[dtype]["aoi"] = aoi_df[dtype].index.values.reshape(-1, 1)
                labels[dtype]["frame"] = drift_df.index.values
                spot_picker = labels_mat["Intervals"]["CumulativeIntervalArray"][0, 0]
                for sp in spot_picker:
                    aoi, start, end = int(sp[-1]), int(sp[1]), int(sp[2])
                    sel = (
                        (labels[dtype]["aoi"] == aoi)
                        & (labels[dtype]["frame"] >= start)
                        & (labels[dtype]["frame"] <= end)
                    )
                    if sp[0] in (-2.0, 0.0, 2.0):
                        labels[dtype]["spotpicker"][sel] = 0
                    elif sp[0] in (-3.0, 1.0, 3.0):
                        labels[dtype]["spotpicker"][sel] = 1
                labels[dtype]["z"] = labels[dtype]["spotpicker"]

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

    def __getitem__(self, key):
        """Read raw frame(s): big-endian int16 + 2^15 unsign shift
        (reference: glimpse_reader.py:168-186)."""
        if isinstance(key, slice):
            return np.stack(
                [
                    self[frame]
                    for frame in range(
                        key.start, key.stop, 1 if key.step is None else key.step
                    )
                ],
                0,
            )
        frame = key
        glimpse_number = self.header["filenumber"][frame - 1]
        glimpse_path = Path(self.config["glimpse-folder"]) / f"{glimpse_number}.glimpse"
        offset = int(self.header["offset"][frame - 1])
        try:
            from tapqir_tpu.csrc import glimpse_native

            img = glimpse_native.read_frame(
                str(glimpse_path), offset, self.height, self.width
            )
        except Exception:
            with open(glimpse_path, "rb") as fid:
                fid.seek(offset)
                img = np.fromfile(
                    fid, dtype=">i2", count=self.height * self.width
                ).reshape(self.height, self.width)
        return img.astype(np.int32) + 2**15

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

    offsets = defaultdict(int)
    offset_medians = []
    data = defaultdict(list)
    target_xy = defaultdict(list)
    labels = defaultdict(list)
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
            target_xy[dtype].append(np.zeros((N, F, 2)))
            data[dtype].append(np.zeros((N, F, P, P), dtype=int))
            labels[dtype].append(glimpse.labels[dtype])
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

        for f, frame in enumerate(progress_bar(glimpse.cumdrift.index)):
            img = glimpse[frame]
            offset_img = img[
                glimpse.offset_y : glimpse.offset_y + offset_P,
                glimpse.offset_x : glimpse.offset_x + offset_P,
            ]
            offset_medians.append(np.median(offset_img))
            values, counts = np.unique(offset_img, return_counts=True)
            for value, count in zip(values, counts):
                offsets[int(value)] += int(count)
            for dtype in glimpse.dtypes:
                crops, targets = _crop_all_aois(img, raw_target_xy[dtype][:, f], P)
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
    offsets = OrderedDict(sorted(offsets.items()))
    offset_samples = np.array(list(offsets.keys()))
    offset_weights = np.array(list(offsets.values()), dtype=float)
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
