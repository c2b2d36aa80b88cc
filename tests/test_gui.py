"""Headless tests for the AOI browser workflow (state + widgets).

The browser's controller (AoiViewerState) is widget-free, so the full
view -> exclude -> aoi_subset.txt -> `tapqir subset` workflow is testable
without a display (reference behaviors: tapqir/gui.py:583-1232).
"""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from tapqir_tpu.gui import AoiViewerState, build_browser, render_aoi_figure
from tapqir_tpu.main import app
from tapqir_tpu.models import models
from tapqir_tpu.utils.dataset import load, save
from tapqir_tpu.utils.simulate import simulate

runner = CliRunner()
os.environ["CI"] = "true"

PARAMS = {
    "pi": 0.3, "width": 1.4, "gain": 7.0, "lamda": 0.15, "proximity": 0.2,
    "offset": 90.0, "height": 3000, "background": 150,
}


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    """A small fitted cosmos run with saved stats (params npz on disk)."""
    tmp_path = tmp_path_factory.mktemp("gui")
    data = simulate("cosmos", N=6, F=20, C=1, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    model = models["cosmos"]()
    model.load(tmp_path)
    model.init(lr=0.005, nbatch_size=6, fbatch_size=20)
    model.run(200, progress_bar=lambda it: it)
    model.compute_stats(CI=0.95)
    return tmp_path


def _state(tmp_path):
    m = models["cosmos"]()
    m.load(tmp_path, data_only=False)
    return AoiViewerState(m, window=5)


def test_navigation_clamps(fitted):
    s = _state(fitted)
    assert s.set_aoi(100) == 5  # Nt-1
    assert s.set_aoi(-3) == 0
    assert s.shift_aoi(2) == 2
    assert s.set_frame(1000) == 20 - 5  # F - window
    assert s.shift_frames(-100) == 0
    assert s.f2 == 5


def test_zoom_expands_span(fitted):
    s = _state(fitted)
    assert s.span == 5
    s.toggle("zoom")
    assert s.span == 20
    assert s.f2 == 20
    # zooming re-clamps f1 so the window stays in range
    s.toggle("zoom", False)
    s.set_frame(15)
    s.toggle("zoom", True)
    assert s.f1 == 0


def test_keyboard_shortcuts(fitted):
    s = _state(fitted)
    assert s.handle_key("ArrowUp") and s.n == 1
    assert s.handle_key("ArrowDown") and s.n == 0
    assert s.handle_key("ArrowRight") and s.f1 == 5
    assert s.handle_key("ArrowLeft") and s.f1 == 0
    assert s.handle_key("z") and s.zoom
    assert s.handle_key("o") and s.show_targets
    assert s.handle_key("n") and not s.show_nonspecific
    assert s.handle_key("e") and s.is_excluded()
    assert not s.handle_key("q")


def test_exclusion_edits_mask_and_writes_subset(fitted):
    s = _state(fitted)
    assert s.data.mask.all()
    s.set_aoi(1)
    assert s.toggle_exclude() is True
    s.toggle_exclude(excluded=True, n=4)
    assert list(s.excluded_aois()) == [1, 4]
    assert list(s.included_aois()) == [0, 2, 3, 5]
    out = s.write_aoi_subset()
    text = out.read_text().strip()
    assert text == "0, 2, 3, 5"
    # include AOI 4 again
    s.toggle_exclude(excluded=False, n=4)
    assert list(s.excluded_aois()) == [1]
    s.write_aoi_subset()

    # `tapqir subset` consumes the file written by the browser
    result = runner.invoke(app, ["--cd", str(fitted), "subset"])
    assert result.exit_code == 0, result.output
    sub = load(fitted / "subset")
    assert sub.Nt == 5
    np.testing.assert_array_equal(
        sub.images, s.data.images[[0, 2, 3, 4, 5]]
    )


def test_save_data_persists_mask(fitted):
    s = _state(fitted)
    s.toggle_exclude(excluded=True, n=2)
    s.save_data()
    reloaded = load(fitted)
    assert not reloaded.mask[2]
    assert reloaded.mask[[0, 1, 3, 4, 5]].all()
    # restore for other tests
    s.toggle_exclude(excluded=False, n=2)
    s.save_data()


def test_render_with_toggles(fitted):
    s = _state(fitted)
    s.toggle("show_targets", True)
    s.toggle("show_nonspecific", False)
    fig = s.render()
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)
    # excluded AOI renders (grayed) without error
    s.toggle_exclude(excluded=True)
    fig = s.render()
    plt.close(fig)
    s.toggle_exclude(excluded=False)


def test_render_aoi_figure_cli_path(fitted):
    out = render_aoi_figure(fitted, "cosmos", n=0, num_frames=5)
    assert out.exists()


def test_build_browser_widgets_headless(fitted):
    pytest.importorskip("ipywidgets")
    state, root = build_browser(fitted, "cosmos", window=5)
    # find the exclude checkbox and AOI selector by description
    def find(widget, pred, acc):
        if pred(widget):
            acc.append(widget)
        for child in getattr(widget, "children", ()):
            find(child, pred, acc)
        return acc

    excl = find(root, lambda w: "Exclude AOI" in str(
        getattr(w, "description", "")), [])[0]
    n_box = find(root, lambda w: str(
        getattr(w, "description", "")).startswith("AOI ("), [])[0]

    # toggling the checkbox edits the dataset mask through the state
    excl.value = True
    assert state.is_excluded(0)
    # switching AOI re-syncs the checkbox to the new AOI's mask
    n_box.value = 3
    assert state.n == 3
    assert excl.value == state.is_excluded(3) == False  # noqa: E712
    # back to the excluded AOI
    n_box.value = 0
    assert excl.value is True
    excl.value = False
    assert not state.is_excluded(0)


def test_build_app_has_tensorboard_tab(fitted):
    pytest.importorskip("ipywidgets")
    from tapqir_tpu.gui import build_app

    root = build_app(fitted)
    tab = root.children[1]
    titles = [tab.get_title(i) for i in range(len(tab.children))]
    assert titles == [
        "Extract AOIs", "Fit the data", "View results", "Tensorboard",
        "Post analysis", "View logs",
    ]
    # the tensorboard tab carries the manual-command fallback label
    def find(widget, pred, acc):
        if pred(widget):
            acc.append(widget)
        for child in getattr(widget, "children", ()):
            find(child, pred, acc)
        return acc

    tb = tab.children[3]
    labels = find(tb, lambda w: "tensorboard --logdir" in str(
        getattr(w, "value", "")), [])
    assert labels, "TensorBoard tab is missing the manual-command fallback"
