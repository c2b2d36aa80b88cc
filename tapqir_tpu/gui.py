"""Interactive AOI browser + notebook app (reference: tapqir/gui.py).

The reference ships an ipywidgets/voila browser app (tapqir/gui.py:154-215
tabs, :583-1232 AOI browser with keyboard navigation, zoom, target/label
overlays, and AOI exclusion persisted via a "Save data" button, :1358-1362
voila entry point). The equivalent here is split into three layers so it
stays testable on headless TPU VMs:

1. :class:`AoiViewerState` - a pure-python controller holding all browser
   state (current AOI, frame window, display toggles, exclusion mask edits)
   with no widget or display dependency. Exclusion edits the dataset mask
   in memory; ``save_data()`` persists it to ``data.tpqr`` and
   ``write_aoi_subset()`` emits the ``aoi_subset.txt`` consumed by
   ``tapqir subset``.
2. Figure rendering - :func:`render_aoi_figure` (CLI ``show``) and the
   state-driven renderer used by the browser.
3. ipywidgets wiring - :func:`build_browser` / :func:`build_app` /
   :func:`app` (``tapqir-gui`` console script; voila when available,
   falling back to jupyter notebook).
"""

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "AoiViewerState",
    "render_aoi_figure",
    "view",
    "build_browser",
    "build_app",
    "app",
    "run",
]


def _load_model_with_stats(cd, model_name):
    from tapqir_tpu.models import models

    m = models[model_name](device="cpu", dtype="float32")
    m.load(cd, data_only=False)
    return m


# ---------------------------------------------------------------------------
# controller
# ---------------------------------------------------------------------------


class AoiViewerState:
    """Headless controller for the interactive AOI browser.

    Mirrors the behavior of the reference's showUI widgets
    (tapqir/gui.py:583-792) without any widget dependency: navigation,
    display toggles, keyboard shortcuts, and AOI exclusion. The widget layer
    (:func:`build_browser`) is a thin shell over this class, so the whole
    workflow is testable headlessly.
    """

    def __init__(self, model, window=15):
        self.model = model
        self.data = model.data
        self.window = int(window)
        self.n = 0
        self.f1 = 0
        self.zoom = False
        self.show_targets = False
        self.show_nonspecific = True
        self.show_labels = False

    # -- navigation ---------------------------------------------------------
    @property
    def span(self) -> int:
        """Frames covered by the strip (4x window when zoomed out)."""
        return self.window * (4 if self.zoom else 1)

    @property
    def f2(self) -> int:
        return min(self.f1 + self.span, self.data.F)

    def set_aoi(self, n: int) -> int:
        self.n = int(np.clip(n, 0, self.data.Nt - 1))
        return self.n

    def shift_aoi(self, delta: int) -> int:
        return self.set_aoi(self.n + delta)

    def set_frame(self, f1: int) -> int:
        self.f1 = int(np.clip(f1, 0, max(0, self.data.F - self.span)))
        return self.f1

    def shift_frames(self, delta: int) -> int:
        return self.set_frame(self.f1 + delta)

    def toggle(self, name: str, value=None) -> bool:
        """Flip (or set) one of: zoom / show_targets / show_nonspecific /
        show_labels."""
        assert name in ("zoom", "show_targets", "show_nonspecific", "show_labels")
        new = (not getattr(self, name)) if value is None else bool(value)
        setattr(self, name, new)
        if name == "zoom":
            self.set_frame(self.f1)  # re-clamp to the new span
        return new

    def handle_key(self, key: str) -> bool:
        """Keyboard shortcuts, same bindings as the reference browser
        (tapqir/gui.py:775-792). Returns True if the key was consumed."""
        actions = {
            "ArrowUp": lambda: self.shift_aoi(1),
            "ArrowDown": lambda: self.shift_aoi(-1),
            "ArrowRight": lambda: self.shift_frames(self.window),
            "ArrowLeft": lambda: self.shift_frames(-self.window),
            "z": lambda: self.toggle("zoom"),
            "o": lambda: self.toggle("show_targets"),
            "n": lambda: self.toggle("show_nonspecific"),
            "e": lambda: self.toggle_exclude(),
        }
        if key not in actions:
            return False
        actions[key]()
        return True

    # -- exclusion ----------------------------------------------------------
    def is_excluded(self, n=None) -> bool:
        return not bool(self.data.mask[self.n if n is None else n])

    def toggle_exclude(self, excluded=None, n=None) -> bool:
        """Exclude/include an AOI from analysis by editing the dataset mask
        in memory (reference: excludeAOI, tapqir/gui.py:1186-1205)."""
        n = self.n if n is None else int(n)
        new_excluded = (
            bool(self.data.mask[n]) if excluded is None else bool(excluded)
        )
        self.data.mask[n] = not new_excluded
        return new_excluded

    def included_aois(self) -> np.ndarray:
        return np.nonzero(np.asarray(self.data.mask))[0]

    def excluded_aois(self) -> np.ndarray:
        return np.nonzero(~np.asarray(self.data.mask))[0]

    # -- persistence --------------------------------------------------------
    def save_data(self):
        """Persist the (mask-edited) dataset back to ``data.tpqr``
        (reference: saveData, tapqir/gui.py:794-799)."""
        from tapqir_tpu.utils.dataset import save

        save(self.data, self.model.path)
        logger.info(f"Saved data with {len(self.excluded_aois())} excluded AOIs")

    def write_aoi_subset(self, path=None) -> Path:
        """Write ``aoi_subset.txt`` listing the kept (non-excluded) AOI
        indices, in the comma-separated format ``tapqir subset`` consumes
        (reference: tapqir/main.py:904-906)."""
        path = Path(path) if path is not None else Path(self.model.path)
        out = path / "aoi_subset.txt" if path.is_dir() else path
        with open(out, "w") as f:
            f.write(", ".join(str(i) for i in self.included_aois()) + "\n")
        logger.info(f"Wrote {out}")
        return out

    # -- rendering ----------------------------------------------------------
    def render(self, num_frames=None):
        """Render the browser figure for the current state."""
        return _render_figure(
            self.model,
            n=self.n,
            f1=self.f1,
            f2=self.f2,
            num_frames=num_frames or self.window,
            show_targets=self.show_targets,
            show_nonspecific=self.show_nonspecific,
            show_labels=self.show_labels,
            excluded=self.is_excluded(),
        )


class FovViewerState:
    """Headless controller for the per-dtype FOV AOI-overlay toggles
    (reference: showAOIs + the per-dtype "Show {dtype} AOIs" checkboxes,
    tapqir/gui.py:683-705): one toggle per AOI dtype (ontarget /
    offtarget / offset region) controls which rectangle overlays are drawn
    on the raw field-of-view frame."""

    def __init__(self, channel_config, P, c=0):
        from tapqir_tpu.imscroll.glimpse_reader import GlimpseDataset

        self.fov = GlimpseDataset(c=c, **channel_config)
        self.P = int(P)
        self.show = {d: True for d in self.fov.dtypes}
        self.show["offset"] = False
        self.frame = 0

    def toggle(self, dtype: str, value=None) -> bool:
        cur = self.show[dtype]
        self.show[dtype] = (not cur) if value is None else bool(value)
        return self.show[dtype]

    @property
    def visible_dtypes(self):
        return [d for d, v in self.show.items() if v]

    def set_frame(self, f: int) -> int:
        self.frame = int(np.clip(f, 0, self.fov.F - 1))
        return self.frame

    def render(self, ax=None):
        """Draw the FOV frame with the enabled overlays (GlimpseDataset.plot
        draws the rectangles; the offset region uses its own P)."""
        self.fov.plot(
            tuple(self.visible_dtypes), self.P, f=self.frame, ax=ax,
            title=f"Frame index {self.frame}",
        )


def build_fov_state(cd, c=0):
    """FovViewerState from a workspace's persisted config.yaml channels, or
    None when the workspace has no glimpse configuration (e.g. datasets
    imported directly as data.tpqr)."""
    import yaml

    cfg_path = Path(cd) / ".tapqir" / "config.yaml"
    if not cfg_path.is_file():
        return None
    cfg = yaml.safe_load(cfg_path.read_text()) or {}
    channels = cfg.get("channels") or []
    if c >= len(channels) or not channels[c].get("glimpse-folder"):
        return None
    merged = {
        k: v
        for k, v in cfg.items()
        if k
        in ("use-offtarget", "offset-x", "offset-y", "frame-range",
            "frame-start", "frame-end", "labels")
    }
    merged.update(channels[c])
    try:
        return FovViewerState(merged, P=cfg.get("P", 14), c=c)
    except Exception as err:  # missing/renamed raw files: degrade gracefully
        logger.warning(f"FOV viewer unavailable: {err}")
        return None


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------


def _render_figure(m, n=0, f1=0, f2=None, num_frames=15, c=0,
                   show_targets=False, show_nonspecific=True,
                   show_labels=False, excluded=False):
    """Viewer figure for AOI ``n``: image strip with spot overlays +
    parameter traces with credible bands. Returns the matplotlib Figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stats = m.params_stats
    data = m.data
    f2 = data.F if f2 is None else min(f2, data.F)
    frames = np.linspace(f1, f2 - 1, min(num_frames, f2 - f1)).astype(int)

    def stat(name, field="Mean"):
        key = f"{name}/{field}"
        if key in stats:
            return np.asarray(stats[key])
        return np.asarray(stats[name])

    p_specific = stat("p_specific")  # (Nt, F, Q)
    height = stat("height")  # (K, Nt, F, Q)
    width = stat("width")
    x = stat("x")
    y = stat("y")
    background = stat("background")  # (Nt, F, C)
    m_probs = stat("m_probs")
    theta_probs = stat("theta_probs") if "theta_probs" in stats else m_probs
    K = height.shape[0]

    nrows = 7
    fig = plt.figure(figsize=(10, 12))
    gs = fig.add_gridspec(
        nrows, len(frames), height_ratios=[2, 1, 1, 1, 1, 1, 1]
    )

    # -- image strip with spot overlays --------------------------------------
    vmin = float(np.percentile(data.images[n, :, c], 5))
    vmax = float(np.percentile(data.images[n, :, c], 99))
    for i, f in enumerate(frames):
        ax = fig.add_subplot(gs[0, i])
        ax.imshow(data.images[n, f, c], vmin=vmin, vmax=vmax, cmap="gray")
        if show_targets:
            ax.plot(
                data.xy[n, f, c, 0], data.xy[n, f, c, 1],
                "o", mfc="none", color="w", markersize=10, mew=0.8,
            )
        for k in range(K):
            if m_probs[k, n, f, c] <= 0.5:
                continue
            specific = theta_probs[k, n, f, c] > 0.5
            if not specific and not show_nonspecific:
                continue
            sx = data.xy[n, f, c, 0] + x[k, n, f, c]
            sy = data.xy[n, f, c, 1] + y[k, n, f, c]
            marker, color = ("+", "#AA3377") if specific else ("x", "#66CCEE")
            ax.plot(sx, sy, marker, color=color, markersize=8, mew=1.2)
        ax.set_title(f"f={f}", fontsize=7)
        ax.axis("off")

    span = slice(f1, f2)
    t = np.arange(f1, f2)
    line_colors = None if not excluded else ["C7"] * max(K, 4)

    def trace(row, values, label, lls=None, uls=None, colors=None):
        ax = fig.add_subplot(gs[row, :])
        values = np.atleast_2d(values)
        for k in range(values.shape[0]):
            color = (
                line_colors[k]
                if line_colors is not None
                else (f"C{k}" if colors is None else colors[k])
            )
            ax.plot(t, values[k][span], color=color, lw=0.8)
            if lls is not None:
                ax.fill_between(
                    t, lls[k][span], uls[k][span], alpha=0.3, color=color
                )
        ax.set_ylabel(label, fontsize=8)
        ax.set_xlim(f1, max(f2 - 1, f1 + 1))
        return ax

    ax_p = trace(1, p_specific[n, :, c][None], "p(specific)", colors=["C2"])
    ax_p.set_ylim(-0.05, 1.05)
    if show_labels and data.labels is not None:
        true_z = np.asarray(data.labels["z"])
        if true_z.ndim == 2:
            true_z = true_z[..., None]
        if n < true_z.shape[0]:
            ax_p.plot(
                t, true_z[n, span, min(c, true_z.shape[-1] - 1)],
                color="k", lw=0.6, ls="--", label="label",
            )
            ax_p.legend(fontsize=6, loc="upper right")
    trace(
        2, height[:, n, :, c], "height",
        stat("height", "LL")[:, n, :, c], stat("height", "UL")[:, n, :, c],
    )
    trace(
        3, width[:, n, :, c], "width",
        stat("width", "LL")[:, n, :, c], stat("width", "UL")[:, n, :, c],
    )
    trace(
        4, x[:, n, :, c], "x",
        stat("x", "LL")[:, n, :, c], stat("x", "UL")[:, n, :, c],
    )
    trace(
        5, y[:, n, :, c], "y",
        stat("y", "LL")[:, n, :, c], stat("y", "UL")[:, n, :, c],
    )
    trace(
        6, background[n, :, c][None], "background",
        stat("background", "LL")[n, :, c][None],
        stat("background", "UL")[n, :, c][None],
        colors=["C3"],
    ).set_xlabel("Time (frame)")

    status = " [EXCLUDED]" if excluded else ""
    fig.suptitle(f"{m.name}: AOI {n}, channel {c}{status}", fontsize=11)
    fig.tight_layout()
    return fig


def render_aoi_figure(cd, model_name="cosmos", n=0, f1=0, f2=None,
                      num_frames=15, c=0, out_path=None):
    """Render the viewer figure for AOI ``n`` and save it as a PNG
    (CLI ``tapqir show``). :return: path of the saved PNG."""
    import matplotlib.pyplot as plt

    cd = Path(cd)
    m = _load_model_with_stats(cd, model_name)
    fig = _render_figure(m, n=n, f1=f1 or 0, f2=f2, num_frames=num_frames, c=c)
    out_path = out_path or cd / f"{model_name}_aoi{n}-channel{c}.png"
    fig.savefig(out_path, dpi=200)
    plt.close(fig)
    return out_path


def view(cd, model_name="cosmos", **kwargs):
    """Notebook helper: render and display the AOI figure inline."""
    out = render_aoi_figure(cd, model_name, **kwargs)
    try:
        from IPython.display import Image, display

        display(Image(str(out)))
    except ImportError:
        pass
    return out


# ---------------------------------------------------------------------------
# widget layer
# ---------------------------------------------------------------------------


def build_browser(cd, model_name="cosmos", window=15):
    """Interactive AOI browser: navigation, zoom, overlays, exclusion.

    :return: ``(state, widget)`` - the :class:`AoiViewerState` controller and
        the root ipywidgets container.
    """
    import ipywidgets as widgets
    import matplotlib.pyplot as plt
    from IPython.display import display

    m = _load_model_with_stats(cd, model_name)
    state = AoiViewerState(m, window=window)
    data = m.data

    fig_out = widgets.Output()
    status = widgets.Label(value="")

    def redraw():
        fig = state.render()
        fig_out.outputs = ()
        with fig_out:
            display(fig)
        plt.close(fig)

    n_box = widgets.BoundedIntText(
        value=0, min=0, max=data.Nt - 1,
        description=f"AOI (0-{data.Nt - 1})",
        style={"description_width": "initial"},
        layout={"width": "170px"},
    )
    f1_slider = widgets.IntSlider(
        value=0, min=0, max=max(0, data.F - window), step=1,
        description=f"Frame (0-{data.F - 1})",
        continuous_update=False,
        style={"description_width": "initial"},
        layout={"width": "340px"},
    )
    f_back = widgets.Button(
        description=f"-{window}", layout=widgets.Layout(width="50px")
    )
    f_fwd = widgets.Button(
        description=f"+{window}", layout=widgets.Layout(width="50px")
    )
    zoom_cb = widgets.Checkbox(
        value=False, description="Zoom out frames ['z']", indent=False
    )
    targets_cb = widgets.Checkbox(
        value=False, description="Show target location ['o']", indent=False
    )
    nonspecific_cb = widgets.Checkbox(
        value=True, description="Show non-specific spots ['n']", indent=False
    )
    exclude_cb = widgets.Checkbox(
        value=state.is_excluded(),
        description="Exclude AOI from analysis ['e']",
        indent=False,
    )
    labels_cb = widgets.Checkbox(
        value=False, description="Show labels", indent=False
    )
    save_btn = widgets.Button(description="Save data")
    subset_btn = widgets.Button(description="Write aoi_subset.txt")

    updating = {"busy": False}

    def sync_widgets():
        updating["busy"] = True
        try:
            n_box.value = state.n
            f1_slider.max = max(0, data.F - state.span)
            f1_slider.value = state.f1
            zoom_cb.value = state.zoom
            targets_cb.value = state.show_targets
            nonspecific_cb.value = state.show_nonspecific
            labels_cb.value = state.show_labels
            exclude_cb.value = state.is_excluded()
        finally:
            updating["busy"] = False

    def on_change(apply):
        def cb(change):
            if updating["busy"]:
                return
            apply(change["new"])
            sync_widgets()
            redraw()

        return cb

    n_box.observe(on_change(state.set_aoi), names="value")
    f1_slider.observe(on_change(state.set_frame), names="value")
    zoom_cb.observe(on_change(lambda v: state.toggle("zoom", v)), names="value")
    targets_cb.observe(
        on_change(lambda v: state.toggle("show_targets", v)), names="value"
    )
    nonspecific_cb.observe(
        on_change(lambda v: state.toggle("show_nonspecific", v)), names="value"
    )
    labels_cb.observe(
        on_change(lambda v: state.toggle("show_labels", v)), names="value"
    )
    exclude_cb.observe(
        on_change(lambda v: state.toggle_exclude(excluded=v)), names="value"
    )
    f_back.on_click(
        lambda b: (state.shift_frames(-state.window), sync_widgets(), redraw())
    )
    f_fwd.on_click(
        lambda b: (state.shift_frames(state.window), sync_widgets(), redraw())
    )

    def on_save(b):
        state.save_data()
        status.value = (
            f"Saved data.tpqr ({len(state.excluded_aois())} AOIs excluded)"
        )

    def on_subset(b):
        out = state.write_aoi_subset()
        status.value = f"Wrote {out} ({len(state.included_aois())} AOIs kept)"

    save_btn.on_click(on_save)
    subset_btn.on_click(on_subset)

    checkboxes = [zoom_cb, targets_cb, nonspecific_cb, exclude_cb]
    if data.labels is not None:
        checkboxes.append(labels_cb)
    controls = widgets.HBox(
        [
            n_box,
            widgets.HBox([f_back, f1_slider, f_fwd]),
            widgets.VBox(checkboxes, layout=widgets.Layout(width="260px")),
        ]
    )
    root = widgets.VBox(
        [controls, widgets.HBox([save_btn, subset_btn, status]), fig_out]
    )

    # keyboard navigation via ipyevents when installed (optional dependency)
    try:  # pragma: no cover - ipyevents not in the test env
        from ipyevents import Event

        ev = Event(source=root, watched_events=["keyup"],
                   prevent_default_action=True)

        def on_key(event):
            if state.handle_key(event.get("key", "")):
                sync_widgets()
                redraw()

        ev.on_dom_event(on_key)
    except ImportError:
        pass

    redraw()
    return state, root


def _run_button(label, out, fn):
    """A button that runs ``fn`` with stdout/logs captured into ``out``."""
    import ipywidgets as widgets

    btn = widgets.Button(description=label, button_style="primary")

    def cb(b):
        with out:
            try:
                fn()
            except Exception as err:  # surface errors in the GUI log area
                logger.exception(f"{label} failed: {err}")

    btn.on_click(cb)
    return btn


def _fit_tab(out):
    import ipywidgets as widgets

    from tapqir_tpu import main as cli

    model = widgets.Dropdown(
        options=list(cli.AVAIL_MODELS), value="cosmos", description="Model"
    )
    S = widgets.BoundedIntText(value=1, min=1, max=4, description="S")
    k_max = widgets.BoundedIntText(value=2, min=1, max=4, description="K")
    nbatch = widgets.IntText(
        value=cli.get_default("nbatch-size", 10), description="AOI batch"
    )
    fbatch = widgets.IntText(
        value=cli.get_default("fbatch-size", 512), description="Frame batch"
    )
    lr = widgets.FloatText(
        value=cli.get_default("learning-rate", 0.005), description="LR"
    )
    num_iter = widgets.IntText(value=0, description="Iterations")
    cpu = widgets.Checkbox(value=False, description="Run on CPU", indent=False)
    matlab = widgets.Checkbox(
        value=False, description="Save matlab parameters", indent=False
    )

    def run_fit():
        cli.fit.callback(
            model=model.value, S=S.value, cpu=cpu.value,
            nbatch_size=nbatch.value, fbatch_size=fbatch.value,
            learning_rate=lr.value, num_iter=num_iter.value,
            k_max=k_max.value, num_restarts=1, matlab=matlab.value,
            dtype="float32", profile=0, overwrite=True, no_input=True,
        )

    return widgets.VBox(
        [model, S, k_max, nbatch, fbatch, lr, num_iter, cpu, matlab,
         _run_button("Fit the data", out, run_fit)]
    )


def _glimpse_tab(out):
    import ipywidgets as widgets

    from tapqir_tpu import main as cli

    g = cli.get_default
    dataset = widgets.Text(value=str(g("dataset", "dataset")),
                           description="Dataset name")
    P = widgets.BoundedIntText(value=g("P", 14), min=5, max=50,
                               description="AOI size")
    num_channels = widgets.BoundedIntText(value=g("num-channels", 1), min=1,
                                          max=4, description="Channels")
    offset_x = widgets.IntText(value=g("offset-x", 10), description="Offset x")
    offset_y = widgets.IntText(value=g("offset-y", 10), description="Offset y")
    offset_P = widgets.IntText(value=g("offset-P", 30), description="Offset size")
    bin_size = widgets.IntText(value=g("bin-size", 1), description="Bin size")
    use_offtarget = widgets.Checkbox(
        value=bool(g("use-offtarget", True)),
        description="Use off-target AOIs", indent=False,
    )
    frame_range = widgets.Checkbox(
        value=False, description="Limit frame range", indent=False
    )
    frame_start = widgets.IntText(value=g("frame-start") or 0,
                                  description="First frame")
    frame_end = widgets.IntText(value=g("frame-end") or 0,
                                description="Last frame")

    def channel_form(c):
        ch = (g("channels") or [{}] * (c + 1))[c] if g("channels") else {}
        return {
            "name": widgets.Text(value=str(ch.get("name", f"channel{c}")),
                                 description="Name"),
            "glimpse-folder": widgets.Text(
                value=str(ch.get("glimpse-folder", "")),
                description="Header/glimpse folder"),
            "driftlist": widgets.Text(value=str(ch.get("driftlist", "")),
                                      description="Driftlist file"),
            "ontarget-aoiinfo": widgets.Text(
                value=str(ch.get("ontarget-aoiinfo", "")),
                description="On-target aoiinfo"),
            "offtarget-aoiinfo": widgets.Text(
                value=str(ch.get("offtarget-aoiinfo", "")),
                description="Off-target aoiinfo"),
        }

    forms = [channel_form(c) for c in range(4)]
    accordion = widgets.Accordion(
        children=[widgets.VBox(list(f.values())) for f in forms]
    )
    for c in range(4):
        accordion.set_title(c, f"Channel #{c}")

    def run_glimpse():
        C = num_channels.value
        cli.glimpse.callback(
            dataset=dataset.value, P=P.value, num_channels=C,
            offset_x=offset_x.value, offset_y=offset_y.value,
            offset_P=offset_P.value, bin_size=bin_size.value,
            frame_start=frame_start.value if frame_range.value else None,
            frame_end=frame_end.value if frame_range.value else None,
            use_offtarget=use_offtarget.value, labels=False,
            names=tuple(forms[c]["name"].value for c in range(C)),
            glimpse_folders=tuple(
                forms[c]["glimpse-folder"].value for c in range(C)
            ),
            driftlists=tuple(forms[c]["driftlist"].value for c in range(C)),
            ontarget_aoiinfos=tuple(
                forms[c]["ontarget-aoiinfo"].value for c in range(C)
            ),
            offtarget_aoiinfos=tuple(
                forms[c]["offtarget-aoiinfo"].value for c in range(C)
            ),
            ontarget_labels=(), offtarget_labels=(),
            overwrite=True, no_input=True,
        )

    return widgets.VBox(
        [dataset, P, num_channels, offset_x, offset_y, offset_P, bin_size,
         use_offtarget, frame_range, frame_start, frame_end, accordion,
         _run_button("Extract AOIs", out, run_glimpse)]
    )


def _view_tab(out, cd):
    import ipywidgets as widgets

    from tapqir_tpu import main as cli

    model = widgets.Dropdown(
        options=list(cli.AVAIL_MODELS), value="cosmos", description="Model"
    )
    holder = widgets.VBox([])

    def load():
        state, browser = build_browser(cd, model.value)
        holder.children = [browser]

    return widgets.VBox(
        [
            widgets.HBox([model, _run_button("Load results", out, load)]),
            holder,
            _fov_controls(out, cd),
        ]
    )


def _fov_controls(out, cd):
    """Field-of-view panel with per-dtype AOI-overlay toggles
    (reference: tapqir/gui.py:683-705)."""
    import ipywidgets as widgets

    fig_out = widgets.Output()
    holder = widgets.VBox([])

    def load_fov():
        state = build_fov_state(cd)
        if state is None:
            with out:
                print(
                    "No glimpse configuration in config.yaml - the FOV view "
                    "needs the raw glimpse files ('tapqir glimpse' inputs)."
                )
            return
        frame_box = widgets.BoundedIntText(
            value=0, min=0, max=state.fov.F - 1, description="Frame"
        )
        boxes = []

        def redraw():
            import matplotlib.pyplot as plt

            fig_out.outputs = ()
            with fig_out:
                fig = plt.figure(
                    figsize=(8, 8 * state.fov.height / state.fov.width)
                )
                state.render(ax=fig.add_subplot(1, 1, 1))
                from IPython.display import display

                display(fig)
                plt.close(fig)

        def on_toggle(dtype):
            def cb(change):
                state.toggle(dtype, change["new"])
                redraw()
            return cb

        for dtype in state.show:
            cb_w = widgets.Checkbox(
                value=state.show[dtype],
                description=f"Show {dtype} AOIs",
                indent=False,
            )
            cb_w.observe(on_toggle(dtype), names="value")
            boxes.append(cb_w)

        def on_frame(change):
            state.set_frame(change["new"])
            redraw()

        frame_box.observe(on_frame, names="value")
        holder.children = [widgets.HBox([frame_box] + boxes), fig_out]
        redraw()

    return widgets.Accordion(
        children=[
            widgets.VBox(
                [_run_button("Load field of view", out, load_fov), holder]
            )
        ],
        titles=("Field of view (AOI overlays)",),
        selected_index=None,
    )


def _tensorboard_tab(cd):
    """TensorBoard tab (reference: tapqir/gui.py:154-215): embed a
    TensorBoard instance on the fit logs when the package is importable,
    otherwise show the manual command."""
    import ipywidgets as widgets

    logdir = Path(cd) / ".tapqir" / "logs"
    info = widgets.Label(
        value=(
            f'Manual alternative: run "tensorboard --logdir {logdir}" in a '
            'terminal and open localhost:6006'
        )
    )
    tb_out = widgets.Output()

    def launch():
        tb_out.outputs = ()
        with tb_out:
            try:
                from tensorboard import notebook

                notebook.start(f"--logdir '{logdir}'")
                notebook.display(height=800)
            except Exception as err:
                print(f"TensorBoard embed unavailable ({err}).")
                print(f'Run "tensorboard --logdir {logdir}" manually.')

    return widgets.VBox(
        [_run_button("Launch TensorBoard", tb_out, launch), info, tb_out]
    )


def _post_tab(out):
    import ipywidgets as widgets

    from tapqir_tpu import main as cli

    # time-to-first-binding
    t_model = widgets.Dropdown(options=list(cli.AVAIL_MODELS), value="cosmos",
                               description="Model")
    t_binary = widgets.Checkbox(value=False, description="Binary rastergram",
                                indent=False)
    t_samples = widgets.IntText(value=2000, description="Samples")
    t_iter = widgets.IntText(value=15000, description="Iterations")
    ttfb_box = widgets.VBox(
        [t_model, t_binary, t_samples, t_iter,
         _run_button(
             "Time-to-first-binding analysis", out,
             lambda: cli.ttfb.callback(
                 model=t_model.value, binary=t_binary.value, cpu=True,
                 num_samples=t_samples.value, num_iter=t_iter.value,
             ),
         )]
    )
    # dwell time
    d_model = widgets.Dropdown(options=list(cli.AVAIL_MODELS),
                               value="cosmos+hmm", description="Model")
    d_K = widgets.BoundedIntText(value=3, min=1, max=5,
                                 description="Exponentials")
    d_samples = widgets.IntText(value=500, description="Samples")
    d_iter = widgets.IntText(value=10000, description="Iterations")
    dwell_box = widgets.VBox(
        [d_model, d_K, d_samples, d_iter,
         _run_button(
             "Dwell-time analysis", out,
             lambda: cli.dwelltime.callback(
                 model=d_model.value, K=d_K.value, cpu=True,
                 num_samples=d_samples.value, num_iter=d_iter.value,
             ),
         )]
    )
    tab = widgets.Tab(children=[ttfb_box, dwell_box])
    tab.set_title(0, "Time-to-first binding")
    tab.set_title(1, "Dwell time")
    return tab


def _log_tab(cd):
    import ipywidgets as widgets

    log_view = widgets.Output(
        layout={"max_height": "600px", "overflow": "auto"}
    )
    reload_btn = widgets.Button(description="(Re)-load logs")

    def cb(b):
        log_view.outputs = ()
        log_file = Path(cd) / ".tapqir" / "loginfo"
        with log_view:
            if log_file.is_file():
                print(log_file.read_text())
            else:
                print("no log file yet")

    reload_btn.on_click(cb)
    return widgets.VBox([reload_btn, log_view])


def build_app(cd):
    """The tabbed GUI for one working directory (reference: cdCmd tabs,
    tapqir/gui.py:154-215): Extract AOIs / Fit / View results /
    Post analysis / Logs."""
    import ipywidgets as widgets

    from tapqir_tpu.main import init_workspace

    cd = Path(cd)
    init_workspace(cd)
    out = widgets.Output(layout={"max_height": "300px", "overflow": "auto"})
    tab = widgets.Tab(
        children=[
            _glimpse_tab(out),
            _fit_tab(out),
            _view_tab(out, cd),
            _tensorboard_tab(cd),
            _post_tab(out),
            _log_tab(cd),
        ]
    )
    for i, title in enumerate(
        ["Extract AOIs", "Fit the data", "View results", "Tensorboard",
         "Post analysis", "View logs"]
    ):
        tab.set_title(i, title)
    wd = widgets.Label(value=f"Working directory: {cd}")
    return widgets.VBox([wd, tab, out])


def run():
    """Notebook entry: working-directory chooser, then the tabbed app
    (reference: tapqir/gui.py:1365-1368)."""
    import ipywidgets as widgets
    from IPython.display import display

    container = widgets.VBox()
    path_box = widgets.Text(
        value=str(Path.cwd()), description="Working directory",
        style={"description_width": "initial"},
        layout={"width": "500px"},
    )
    go = widgets.Button(description="Open", button_style="primary")

    def cb(b):
        container.children = [build_app(path_box.value)]

    go.on_click(cb)
    container.children = [widgets.HBox([path_box, go])]
    display(container)


APP_NOTEBOOK_CELL = "from tapqir_tpu.gui import run\nrun()\n"


def _write_app_notebook(path: Path) -> Path:
    nb = {
        "cells": [
            {
                "cell_type": "code",
                "execution_count": None,
                "metadata": {},
                "outputs": [],
                "source": APP_NOTEBOOK_CELL,
            }
        ],
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            }
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    path.write_text(json.dumps(nb))
    return path


def app():  # pragma: no cover - launches a browser server
    """``tapqir-gui`` console entry point: serve the notebook app via voila
    when installed, else jupyter notebook (reference: tapqir/gui.py:1358-1362
    shells out to voila).

    The launcher notebook is written to a private temporary directory (not
    the user's home) and the server runs as a child process via subprocess,
    so shell metacharacters in paths are inert and Ctrl-C propagates."""
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory(prefix="tapqir-gui-") as td:
        nbpath = _write_app_notebook(Path(td) / "tapqir-gui.ipynb")
        try:
            import voila  # noqa: F401

            cmd = [sys.executable, "-m", "voila", str(nbpath)]
        except ImportError:
            cmd = [sys.executable, "-m", "notebook", str(nbpath)]
        logger.info(f"Launching GUI: {' '.join(cmd)}")
        try:
            subprocess.run(cmd, check=False)
        except KeyboardInterrupt:
            pass
