"""Glimpse ingest tests on a synthetic raw dataset."""

import os

import numpy as np
import pytest
from scipy.io import savemat

from tapqir_tpu.imscroll import GlimpseDataset, bin_hist, read_glimpse


@pytest.fixture()
def glimpse_dir(tmp_path):
    """Synthesize header.mat + driftlist + aoiinfo + raw .glimpse binaries."""
    H, W, F = 48, 64, 6
    rng = np.random.default_rng(0)
    gdir = tmp_path / "glimpse"
    gdir.mkdir()

    # frames: dark background ~90 (offset), bright 7x7 squares at AOI centers
    frames = rng.integers(88, 93, size=(F, H, W))
    aoi_centers = [(20, 12), (30, 40)]  # (y, x), 0-based
    off_centers = [(10, 50)]
    for f in range(F):
        for y, x in aoi_centers:
            frames[f, y - 3 : y + 4, x - 3 : x + 4] += 400
        # off-target stays dark
    # raw storage: big-endian int16, value - 2^15
    per_frame_bytes = H * W * 2
    offsets = []
    filenumbers = []
    with open(gdir / "0.glimpse", "wb") as fh:
        for f in range(F):
            offsets.append(fh.tell())
            filenumbers.append(0)
            (frames[f] - 2**15).astype(">i2").tofile(fh)

    header = {
        "vid": {
            "height": H,
            "width": W,
            "nframes": F,
            "filenumber": np.array(filenumbers),
            "offset": np.array(offsets),
            "ttb": np.arange(F) * 100.0,
            "time1": 12345.0,
        }
    }
    savemat(gdir / "header.mat", header)

    # driftlist: zero drift except small dx on later frames
    drift = np.zeros((F, 3))
    drift[:, 0] = np.arange(1, F + 1)  # frame numbers (1-based)
    savemat(tmp_path / "driftlist.mat", {"driftlist": drift})

    # aoiinfo: matlab 1-based coordinates
    def aoiinfo_rows(centers):
        # real aoiinfo coordinates are fractional (sub-pixel localization)
        return np.array(
            [
                [1, 1.0, y + 1 + 0.3, x + 1 + 0.4, 7, i + 1]
                for i, (y, x) in enumerate(centers)
            ],
            float,
        )

    savemat(tmp_path / "aoi_on.mat", {"aoiinfo2": aoiinfo_rows(aoi_centers)})
    savemat(tmp_path / "aoi_off.mat", {"aoiinfo2": aoiinfo_rows(off_centers)})
    return tmp_path, gdir


def _config(tmp_path, gdir):
    return {
        "P": 14,
        "num-channels": 1,
        "dataset": "synthetic",
        "offset-P": 8,
        "bin-size": 1,
        "frame-range": False,
        "frame-start": None,
        "frame-end": None,
        "use-offtarget": True,
        "labels": False,
        "channels": [
            {
                "name": "channel0",
                "glimpse-folder": str(gdir),
                "driftlist": str(tmp_path / "driftlist.mat"),
                "ontarget-aoiinfo": str(tmp_path / "aoi_on.mat"),
                "offtarget-aoiinfo": str(tmp_path / "aoi_off.mat"),
                "ontarget-labels": None,
                "offtarget-labels": None,
            }
        ],
        "offset-x": 0,
        "offset-y": 38,
    }


def test_glimpse_dataset_frame_read(glimpse_dir):
    tmp_path, gdir = glimpse_dir
    cfg = _config(tmp_path, gdir)
    kwargs = {k: v for k, v in cfg.items() if k not in
              ("P", "num-channels", "dataset", "offset-P", "bin-size", "channels")}
    g = GlimpseDataset(**kwargs, **cfg["channels"][0])
    assert g.N == 2 and g.Nc == 1 and g.F == 6
    img = g[1]
    assert img.shape == (48, 64)
    # unsigned shift restores raw values around 90 (dark) / 490 (spots)
    assert 85 <= np.median(img) <= 95
    assert img[20, 12] > 400


def test_read_glimpse_end_to_end(glimpse_dir):
    tmp_path, gdir = glimpse_dir
    os.environ["CI"] = "true"  # skip QC plots
    data = read_glimpse(tmp_path, **_config(tmp_path, gdir))
    assert data.Nt == 3 and data.N == 2 and data.Nc == 1
    assert data.images.shape == (3, 6, 1, 14, 14)
    # targets within the central pixel
    assert (data.xy > 0.5 * 14 - 1).all() and (data.xy < 0.5 * 14).all()
    # on-target crops capture the bright square; off-target crop stays dark
    assert data.images[0, 0, 0].max() > 400
    assert data.images[2, 0, 0].max() < 200
    # offset histogram covers the dark corner values
    assert 88 <= data.offset.mean <= 93
    # saved to disk
    assert (tmp_path / "data.tpqr").exists()
    # loadable
    from tapqir_tpu.utils.dataset import load

    loaded = load(tmp_path)
    np.testing.assert_array_equal(loaded.images, data.images)


def test_bin_hist():
    samples = np.arange(10)
    weights = np.ones(10) / 10
    s2, w2 = bin_hist(samples, weights, 3)
    assert s2[0] == 0 and w2[0] == pytest.approx(0.1)
    np.testing.assert_allclose(w2.sum(), 1.0)
    assert len(s2) == 1 + 3  # 1 + q + remainder


def test_native_decoder_matches_numpy(glimpse_dir):
    tmp_path, gdir = glimpse_dir
    pytest.importorskip("ctypes")
    try:
        from tapqir_tpu.csrc import glimpse_native
        img_native = glimpse_native.read_frame(gdir / "0.glimpse", 0, 48, 64)
    except Exception as err:
        pytest.skip(f"native build unavailable: {err}")
    with open(gdir / "0.glimpse", "rb") as fid:
        img_np = np.fromfile(fid, dtype=">i2", count=48 * 64).reshape(48, 64)
    np.testing.assert_array_equal(img_native, img_np.astype(np.int32))

    # batch read + shifted values
    frames = glimpse_native.read_frames(gdir / "0.glimpse", [0, 48 * 64 * 2], 48, 64)
    assert frames.shape == (2, 48, 64)
    np.testing.assert_array_equal(frames[0], img_np.astype(np.int32) + 2**15)

    # crops
    crops = glimpse_native.crop_aois(frames[0], [5, 20], [3, 10], 14)
    np.testing.assert_array_equal(crops[0], frames[0][3:17, 5:19])
    np.testing.assert_array_equal(crops[1], frames[0][10:24, 20:34])


def test_fov_viewer_state_toggles_and_renders(glimpse_dir):
    """Headless FOV overlay controller (reference gui.py:683-705): per-dtype
    toggles select the rectangle overlays; render draws without error."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tapqir_tpu.gui import FovViewerState

    tmp_path, gdir = glimpse_dir
    cfg = _config(tmp_path, gdir)
    merged = {k: v for k, v in cfg.items() if k not in
              ("P", "num-channels", "dataset", "offset-P", "bin-size",
               "channels")}
    merged.update(cfg["channels"][0])
    state = FovViewerState(merged, P=cfg["P"])
    assert state.show == {"ontarget": True, "offtarget": True, "offset": False}
    assert state.visible_dtypes == ["ontarget", "offtarget"]
    assert state.toggle("offtarget") is False
    assert state.toggle("offset", True) is True
    assert state.visible_dtypes == ["ontarget", "offset"]
    assert state.set_frame(99) == state.fov.F - 1  # clamped
    fig = plt.figure()
    state.render(ax=fig.add_subplot(1, 1, 1))
    plt.close(fig)


def test_build_fov_state_from_workspace(glimpse_dir, tmp_path):
    """build_fov_state reads the persisted config.yaml; returns None when
    the workspace has no glimpse configuration."""
    import yaml

    from tapqir_tpu.gui import build_fov_state

    src_tmp, gdir = glimpse_dir
    cd = tmp_path / "ws"
    (cd / ".tapqir").mkdir(parents=True)
    with open(cd / ".tapqir" / "config.yaml", "w") as f:
        yaml.dump(_config(src_tmp, gdir), f)
    state = build_fov_state(cd)
    assert state is not None
    assert state.fov.N == 2 and state.fov.F == 6

    empty = tmp_path / "empty"
    (empty / ".tapqir").mkdir(parents=True)
    (empty / ".tapqir" / "config.yaml").write_text("P: 14\n")
    assert build_fov_state(empty) is None


def test_glimpse_cli_command(glimpse_dir):
    """The `tapqir glimpse` CLI drives read_glimpse end to end and writes
    data.tpqr + config.yaml (reference: test_tapqir.py's CliRunner pattern)."""
    from click.testing import CliRunner

    from tapqir_tpu.main import app
    from tapqir_tpu.utils.dataset import load

    tmp_path, gdir = glimpse_dir
    os.environ["CI"] = "true"  # skip QC plots
    result = CliRunner().invoke(
        app,
        [
            "--cd", str(tmp_path), "glimpse",
            "--dataset", "synthetic", "-P", "14", "--num-channels", "1",
            "--offset-x", "0", "--offset-y", "38", "--offset-p", "8",
            "--bin-size", "1", "--use-offtarget",
            "--name", "channel0",
            "--glimpse-folder", str(gdir),
            "--driftlist", str(tmp_path / "driftlist.mat"),
            "--ontarget-aoiinfo", str(tmp_path / "aoi_on.mat"),
            "--offtarget-aoiinfo", str(tmp_path / "aoi_off.mat"),
            "--no-input",
        ],
    )
    assert result.exit_code == 0, result.output
    data = load(tmp_path)
    assert data.Nt == 3 and data.N == 2 and data.F == 6
    assert (tmp_path / ".tapqir" / "config.yaml").exists()
