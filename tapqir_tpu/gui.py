"""AOI viewer (reference: tapqir/gui.py + the interactive ``show`` command,
tapqir/main.py:607-870).

The reference ships an ipywidgets/voila browser app whose central piece is an
AOI browser: a strip of AOI images with spot-location overlays plus parameter
time series (p_specific, height, width, x, y, background) with credible
bands. Here that view is a matplotlib figure renderer usable from the CLI
(``tapqir show``), scripts, or notebooks; it has no widget/event dependencies
so it works headless on TPU VMs.
"""

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["render_aoi_figure", "view"]


def _load_model_with_stats(cd, model_name):
    from tapqir_tpu.models import models

    m = models[model_name](device="cpu", dtype="float32")
    m.load(cd, data_only=False)
    return m


def render_aoi_figure(cd, model_name="cosmos", n=0, f1=0, f2=None,
                      num_frames=15, c=0, out_path=None):
    """Render the viewer figure for AOI ``n``: image strip + parameter traces.

    :return: path of the saved PNG.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cd = Path(cd)
    m = _load_model_with_stats(cd, model_name)
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
    K = height.shape[0]

    nrows = 6
    fig = plt.figure(figsize=(10, 11))
    gs = fig.add_gridspec(nrows, len(frames), height_ratios=[2, 1, 1, 1, 1, 1])

    # -- image strip with spot overlays --------------------------------------
    vmin = float(np.percentile(data.images[n, :, c], 5))
    vmax = float(np.percentile(data.images[n, :, c], 99))
    for i, f in enumerate(frames):
        ax = fig.add_subplot(gs[0, i])
        ax.imshow(data.images[n, f, c], vmin=vmin, vmax=vmax, cmap="gray")
        for k in range(K):
            if m_probs[k, n, f, c] > 0.5:
                sx = data.xy[n, f, c, 0] + x[k, n, f, c]
                sy = data.xy[n, f, c, 1] + y[k, n, f, c]
                ax.plot(sx, sy, "+", color=f"C{k}", markersize=8)
        ax.set_title(f"f={f}", fontsize=7)
        ax.axis("off")

    span = slice(f1, f2)
    t = np.arange(f1, f2)

    def trace(row, values, label, lls=None, uls=None, colors=None):
        ax = fig.add_subplot(gs[row, :])
        values = np.atleast_2d(values)
        for k in range(values.shape[0]):
            color = f"C{k}" if colors is None else colors[k]
            ax.plot(t, values[k][span], color=color, lw=0.8)
            if lls is not None:
                ax.fill_between(
                    t, lls[k][span], uls[k][span], alpha=0.3, color=color
                )
        ax.set_ylabel(label, fontsize=8)
        ax.set_xlim(f1, f2 - 1)
        return ax

    ax_p = trace(1, p_specific[n, :, c][None], "p(specific)", colors=["C2"])
    ax_p.set_ylim(-0.05, 1.05)
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
        5, background[n, :, c][None], "background",
        stat("background", "LL")[n, :, c][None],
        stat("background", "UL")[n, :, c][None],
        colors=["C3"],
    ).set_xlabel("Time (frame)")

    fig.suptitle(f"{model_name}: AOI {n}, channel {c}", fontsize=11)
    fig.tight_layout()
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


def app(cd=None):  # pragma: no cover
    """The reference launches a voila browser app (tapqir/gui.py:1358-1362).
    Interactive widgets are not available on headless TPU VMs; use
    :func:`render_aoi_figure` / ``tapqir show`` instead."""
    raise NotImplementedError(
        "The browser GUI is not available; use `tapqir show` or "
        "tapqir_tpu.gui.render_aoi_figure()."
    )
