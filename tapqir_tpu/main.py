"""Command-line interface (reference: tapqir/main.py).

Same workspace model as the reference: every command runs inside an analysis
folder (``--cd``), which holds ``.tapqir/`` (config.yaml, loginfo, model
checkpoints, logs) next to ``data.tpqr`` and result files. Commands:

* ``glimpse``   - extract AOIs from raw glimpse files -> data.tpqr
* ``fit``       - fit a model by SVI (cosmos / crosstalk / cosmos+hmm)
* ``stats``     - posterior statistics (credible intervals, SNR, accuracy)
* ``show``      - render an AOI browser figure (static export)
* ``log``       - page the log file
* ``subset``    - subset AOIs listed in aoi_subset.txt into subset/data.tpqr
* ``ttfb``      - time-to-first-binding analysis (Friedman-Gelles Eq. 4/7)
* ``dwelltime`` - dwell-time K-exponential analysis (kon / koff)

Notable differences from the reference: the compute device is the JAX
default backend (TPU) or ``--cpu``; ``--funsor/--pyro`` backend switching
does not exist (one TPU-native backend); default precision is float32
(``--dtype double`` restores the reference's float64 on CPU).
"""

import logging
import os
import sys
from pathlib import Path

import click
import numpy as np
import yaml

from tapqir_tpu import __version__

DEFAULTS = {}

AVAIL_MODELS = ["cosmos", "crosstalk", "cosmos+hmm"]


def _config_path():
    return Path(DEFAULTS["cd"]) / ".tapqir" / "config.yaml"


def _save_config():
    with open(_config_path(), "w") as cfg_file:
        yaml.dump(
            {k: v for k, v in DEFAULTS.items() if k != "cd"},
            cfg_file,
            sort_keys=False,
        )


def get_default(key, fallback=None):
    return DEFAULTS.get(key, fallback)


def _progress():
    from tqdm import tqdm

    return tqdm


@click.group(name="tapqir")
@click.option(
    "--cd",
    type=click.Path(exists=True, file_okay=False, path_type=Path),
    default=Path.cwd,
    help="Change working directory.",
)
@click.version_option(__version__, "--version")
def app(cd):
    """Bayesian analysis of co-localization single-molecule microscopy image
    data, TPU-native. Initializes a ``.tapqir`` workspace in the working
    directory (reference: tapqir/main.py:1387-1488)."""
    init_workspace(cd)


def init_workspace(cd):
    """Initialize the ``.tapqir`` workspace + config + logger for ``cd``.

    Shared by the CLI group callback and the GUI (the reference GUI calls
    ``main(cd=path)`` the same way, tapqir/gui.py:169)."""
    from tapqir_tpu.logger import init_logger

    cd = Path(cd)
    DEFAULTS.clear()
    DEFAULTS["cd"] = cd
    workdir = cd / ".tapqir"
    first_time = not workdir.is_dir()
    workdir.mkdir(exist_ok=True)
    cfg = _config_path()
    if not cfg.is_file():
        DEFAULTS.update(
            {
                "P": 14,
                "nbatch-size": 10,
                "fbatch-size": 512,
                "learning-rate": 0.005,
                "num-channels": 1,
                "cuda": True,  # "accelerator" - kept for config compat
                "matlab": False,
                "priors": {
                    "background_mean_std": 1000,
                    "background_std_std": 100,
                    "lamda_rate": 1,
                    "height_std": 10000,
                    "width_min": 0.75,
                    "width_max": 2.25,
                    "proximity_rate": 1,
                    "gain_std": 50,
                },
                "offset-x": 10,
                "offset-y": 10,
                "offset-P": 30,
                "bin-size": 1,
            }
        )
        _save_config()

    logger = init_logger(cd)
    if first_time:
        click.echo(f"Initialized Tapqir workspace at {workdir}.")
    with open(cfg) as cfg_file:
        DEFAULTS.update(yaml.safe_load(cfg_file) or {})
    logger.info(f"Configuration options are read from {cfg}.")


def _device_settings(cpu_flag):
    return "cpu" if cpu_flag else None  # None -> jax default backend (TPU)


def _make_prompter():
    """Interactive prompt helper: ask for any option the user did not pass
    on the command line, defaulting to the current (config-derived) value
    (reference prompt UX: tapqir/main.py:321-485)."""
    ctx = click.get_current_context(silent=True)

    def ask(name, value, text, cast=None, is_bool=False):
        if ctx is not None:
            src = ctx.get_parameter_source(name)
            if src is not None and src.name == "COMMANDLINE":
                return value  # explicitly given: don't re-ask
        if is_bool:
            return click.confirm(text, default=bool(value))
        return click.prompt(text, default=value, type=cast or type(value))

    return ask


@app.command()
@click.option("--dataset", default=lambda: get_default("dataset", "dataset"),
              help="Dataset name")
@click.option("-P", "--aoi-size", "P", type=int,
              default=lambda: get_default("P", 14), help="AOI image size")
@click.option("--num-channels", "-C", type=int,
              default=lambda: get_default("num-channels", 1),
              help="Number of color channels")
@click.option("--offset-x", type=int, default=lambda: get_default("offset-x", 10),
              help="Offset region top-left x")
@click.option("--offset-y", type=int, default=lambda: get_default("offset-y", 10),
              help="Offset region top-left y")
@click.option("--offset-p", "offset_P", type=int,
              default=lambda: get_default("offset-P", 30), help="Offset region size")
@click.option("--bin-size", type=int, default=lambda: get_default("bin-size", 1),
              help="Offset histogram bin size")
@click.option("--frame-start", type=int, default=lambda: get_default("frame-start"),
              help="First frame")
@click.option("--frame-end", type=int, default=lambda: get_default("frame-end"),
              help="Last frame")
@click.option("--use-offtarget/--no-offtarget",
              default=lambda: bool(get_default("use-offtarget", True)),
              help="Use off-target control AOIs")
@click.option("--labels/--no-labels", default=False,
              help="Parse spot-picker label intervals")
@click.option("--name", "names", multiple=True, help="Channel name (repeatable)")
@click.option("--glimpse-folder", "glimpse_folders", multiple=True,
              type=click.Path(), help="Channel header/glimpse folder (repeatable)")
@click.option("--driftlist", "driftlists", multiple=True, type=click.Path(),
              help="Channel driftlist file (repeatable)")
@click.option("--ontarget-aoiinfo", "ontarget_aoiinfos", multiple=True,
              type=click.Path(), help="On-target aoiinfo file (repeatable)")
@click.option("--offtarget-aoiinfo", "offtarget_aoiinfos", multiple=True,
              type=click.Path(), help="Off-target aoiinfo file (repeatable)")
@click.option("--ontarget-labels", "ontarget_labels", multiple=True,
              type=click.Path(), help="On-target label intervals (repeatable)")
@click.option("--offtarget-labels", "offtarget_labels", multiple=True,
              type=click.Path(), help="Off-target label intervals (repeatable)")
@click.option("--overwrite", "-w", is_flag=True, default=True,
              help="Persist these values to config.yaml")
@click.option("--no-input", is_flag=True, default=False,
              help="Disable interactive prompt.")
def glimpse(dataset, P, num_channels, offset_x, offset_y, offset_P, bin_size,
            frame_start, frame_end, use_offtarget, labels, names,
            glimpse_folders, driftlists, ontarget_aoiinfos, offtarget_aoiinfos,
            ontarget_labels, offtarget_labels, overwrite, no_input):
    """Extract AOIs from raw glimpse images -> ``data.tpqr``
    (reference: tapqir/main.py:66-318)."""
    import copy

    from tapqir_tpu.imscroll import read_glimpse

    logger = logging.getLogger("tapqir")
    cd = DEFAULTS["cd"]

    # deep-copied: prompted values must not leak into DEFAULTS (and thence
    # into later commands in the same process) unless --overwrite persists
    # them below
    channels = copy.deepcopy(DEFAULTS.get("channels") or [])
    for c in range(num_channels):
        if c >= len(channels):
            channels.append({})
        ch = channels[c]
        if c < len(names):
            ch["name"] = names[c]
        if c < len(glimpse_folders):
            ch["glimpse-folder"] = str(glimpse_folders[c])
        if c < len(driftlists):
            ch["driftlist"] = str(driftlists[c])
        if c < len(ontarget_aoiinfos):
            ch["ontarget-aoiinfo"] = str(ontarget_aoiinfos[c])
        if c < len(offtarget_aoiinfos):
            ch["offtarget-aoiinfo"] = str(offtarget_aoiinfos[c])
        ch["ontarget-labels"] = (
            str(ontarget_labels[c]) if c < len(ontarget_labels) else ch.get("ontarget-labels")
        )
        ch["offtarget-labels"] = (
            str(offtarget_labels[c]) if c < len(offtarget_labels) else ch.get("offtarget-labels")
        )
        # interactive prompts for anything still missing
        required = ["name", "glimpse-folder", "driftlist", "ontarget-aoiinfo"]
        if use_offtarget:
            required.append("offtarget-aoiinfo")
        for key in required:
            if ch.get(key) is None:
                if no_input:
                    raise click.UsageError(
                        f"channel {c}: missing required option '{key}'"
                    )
                ch[key] = click.prompt(f"Channel #{c}: {key}")
        ch.setdefault("name", f"channel{c}")
    channels = channels[:num_channels]

    if overwrite:
        DEFAULTS.update(
            {
                "dataset": dataset,
                "P": P,
                "num-channels": num_channels,
                "offset-x": offset_x,
                "offset-y": offset_y,
                "offset-P": offset_P,
                "bin-size": bin_size,
                "frame-start": frame_start,
                "frame-end": frame_end,
                "use-offtarget": use_offtarget,
                "channels": channels,
            }
        )
        _save_config()

    logger.info("Extracting AOIs ...")
    read_glimpse(
        cd,
        progress_bar=_progress(),
        **{
            "P": P,
            "num-channels": num_channels,
            "dataset": dataset,
            "channels": channels,
            "offset-P": offset_P,
            "bin-size": bin_size,
            "offset-x": offset_x,
            "offset-y": offset_y,
            "frame-range": frame_start is not None and frame_end is not None,
            "frame-start": frame_start,
            "frame-end": frame_end,
            "use-offtarget": use_offtarget,
            "labels": labels,
        },
    )
    logger.info("Extracting AOIs: Done")
    return 0


def _resolve_mesh(model, mesh_opt, logger):
    """Build an ("aoi", "frame") device mesh from the --mesh option.

    "auto": AOI-shard over every visible device when more than one is
    present; "none"/"off"/"1x1": single device; "AxB": explicit mesh shape
    (the frame axis must divide F). Arbitrary AOI counts are supported —
    Model.pad_for_mesh pads the AOI axis with masked dead rows (real
    DatasetA is a prime 857 AOIs), so auto-mesh never silently degrades
    for divisibility reasons. Returns None for the single-device path."""
    import jax

    if mesh_opt in (None, "none", "off", "1x1"):
        return None
    from tapqir_tpu.parallel.sharding import make_mesh

    Nt, F = model.data.Nt, model.data.F
    devs = jax.devices()
    if mesh_opt == "auto":
        if len(devs) <= 1:
            return None
        d = len(devs)
        logger.info(f"Auto mesh: {d} aoi x 1 frame over {len(devs)} devices")
        return make_mesh(d, 1)
    try:
        n_a, n_f = (int(x) for x in mesh_opt.lower().split("x"))
    except ValueError:
        raise click.UsageError(f"--mesh must be 'auto', 'none' or 'AxB', got {mesh_opt!r}")
    if n_a * n_f <= 1:
        return None
    if F % n_f:
        raise click.UsageError(
            f"mesh frame axis {n_f} must divide F={F} (the frame axis is "
            "not padded); AOI counts are padded automatically"
        )
    return make_mesh(n_a, n_f)


def _make_model(model, S, k_max, cpu, dtype):
    from tapqir_tpu.models import models

    settings = {
        "S": S,
        "K": k_max,
        "device": _device_settings(cpu),
        "dtype": dtype,
        "priors": DEFAULTS.get("priors"),
    }
    return models[model](**settings)


@app.command()
@click.option("--model", type=click.Choice(AVAIL_MODELS), default="cosmos",
              help="Tapqir model")
@click.option("-S", "--num-states", "S", type=int, default=1,
              help="Number of spot states")
@click.option("--cpu/--cuda", "cpu", default=False,
              help="Run on CPU instead of the accelerator")
@click.option("--nbatch-size", "-n", type=int,
              default=lambda: get_default("nbatch-size", 10), help="AOI batch size")
@click.option("--fbatch-size", "-f", type=int,
              default=lambda: get_default("fbatch-size", 512),
              help="Frame batch size")
@click.option("--learning-rate", "-lr", type=float,
              default=lambda: get_default("learning-rate", 0.005),
              help="Learning rate")
@click.option("--frame-sampling", type=click.Choice(["random", "window"]),
              default="random",
              help="Frame minibatch scheme: independent random subsets "
                   "(reference behavior) or a cyclic contiguous window")
@click.option("--num-iter", "-it", type=int, default=0,
              help="Number of iterations (0 = run to convergence)")
@click.option("--k-max", "-k", type=int, default=2,
              help="Maximum number of spots per image")
@click.option("--num-restarts", "-R", type=int, default=1,
              help="Batched random restarts: run R vmapped SVI chains for "
                   "--restart-iter steps, keep the best (by trailing -ELBO) "
                   "and continue it to convergence")
@click.option("--restart-iter", type=int, default=2000,
              help="Warm-up iterations per restart chain before selection")
@click.option("--mesh", type=str, default="auto",
              help="Multi-chip mesh: 'auto' (AOI-shard over all visible "
                   "devices), 'none', or an explicit 'AxB' (aoi x frame) "
                   "shape that divides the dataset")
@click.option("--matlab", is_flag=True,
              default=lambda: bool(get_default("matlab", False)),
              help="Save parameters in matlab format")
@click.option("--dtype", type=click.Choice(["float32", "double"]),
              default="float32", help="Floating point precision")
@click.option("--profile", type=int, default=0,
              help="Capture a jax profiler trace of N training steps and exit")
@click.option("--warm-start/--no-warm-start", "warm_start", default=None,
              help="cosmos+hmm only: initialize the chain guide from the "
                   "workspace's converged cosmos fit (the recommended "
                   "cosmos-then-hmm workflow). Default: on when a cosmos "
                   "fit exists and no cosmos+hmm checkpoint does.")
@click.option("--overwrite", "-w", is_flag=True, default=True,
              help="Persist these values to config.yaml")
@click.option("--no-input", is_flag=True, default=False,
              help="Disable interactive prompt.")
def fit(model, S, cpu, nbatch_size, fbatch_size, learning_rate,
        frame_sampling, num_iter, k_max, num_restarts, restart_iter, mesh,
        matlab, dtype, profile, warm_start, overwrite, no_input):
    """Fit the data to the selected model (reference: tapqir/main.py:321-485).

    Available models: cosmos (time-independent), cosmos+hmm (hidden Markov),
    crosstalk (multi-dye bleed-through)."""
    from tapqir_tpu.exceptions import TapqirFileNotFoundError, TpuOutOfMemoryError

    logger = logging.getLogger("tapqir")
    cd = DEFAULTS["cd"]

    # interactive prompts with persisted defaults, as in the reference
    # (tapqir/main.py:321-485); values given on the command line are kept
    if not no_input:
        ask = _make_prompter()
        model = ask("model", model, "Tapqir model",
                    cast=click.Choice(AVAIL_MODELS))
        S = ask("S", S, "Number of spot states")
        cpu = not ask("cpu", not cpu, "Run computations on the accelerator?",
                      is_bool=True)
        nbatch_size = ask("nbatch_size", nbatch_size, "AOI batch size")
        fbatch_size = ask("fbatch_size", fbatch_size, "Frame batch size")
        learning_rate = ask("learning_rate", learning_rate, "Learning rate")
        num_iter = ask("num_iter", num_iter,
                       "Number of iterations (0 = run to convergence)")
        matlab = ask("matlab", matlab, "Save parameters in matlab format?",
                     is_bool=True)
        overwrite = ask("overwrite", overwrite, "Overwrite default values?",
                        is_bool=True)

    if overwrite:
        DEFAULTS["cuda"] = not cpu
        DEFAULTS["nbatch-size"] = nbatch_size
        DEFAULTS["fbatch-size"] = fbatch_size
        DEFAULTS["learning-rate"] = learning_rate
        DEFAULTS["matlab"] = matlab
        # persist the model topology so stats/ttfb/dwelltime reconstruct the
        # same model the checkpoint was fit with (a default-S/K reconstruction
        # would silently mismatch a -S 2 / -k 3 fit)
        DEFAULTS["model"] = model
        DEFAULTS["S"] = S
        DEFAULTS["k-max"] = k_max
        _save_config()

    logger.info("Fitting the data ...")
    m = _make_model(model, S, k_max, cpu, dtype)
    m.frame_sampling = frame_sampling
    try:
        m.load(cd)
    except TapqirFileNotFoundError as err:
        logger.exception(f"Failed to load {err.name} file")
        sys.exit(1)
    m.init(learning_rate, nbatch_size, fbatch_size)

    # cosmos -> hmm warm start (the reference's recommended workflow): on by
    # default for a FRESH cosmos+hmm fit when a cosmos fit is present
    if model == "cosmos+hmm" and warm_start is not False:
        cosmos_ckpt = Path(cd) / ".tapqir" / "cosmos_model.tpqr"
        fresh = getattr(m, "iter", 0) == 0
        if warm_start and not cosmos_ckpt.exists():
            logger.error(
                "--warm-start requires a cosmos fit in this workspace "
                f"({cosmos_ckpt} not found); run `tapqir fit --model cosmos` "
                "first"
            )
            sys.exit(1)
        if cosmos_ckpt.exists() and (fresh or warm_start):
            logger.info(
                "Warm-starting cosmos+hmm from the cosmos fit "
                "(--no-warm-start to disable)"
            )
            m.warm_start_from_cosmos()

    if profile:
        out = m.profile_trace(num_steps=profile)
        logger.info(f"Profiler trace written to {out}")
        return 0
    mesh_obj = None if cpu else _resolve_mesh(m, mesh, logger)
    try:
        if num_restarts > 1:
            # warm-up phase: R independent chains, keep the best ...
            progress = lambda it, loss: logger.info(  # noqa: E731
                f"restarts @{it}: best -ELBO {loss:.1f}"
            )
            logger.info(f"Running {num_restarts} batched random restarts ...")
            if mesh_obj is not None:
                from tapqir_tpu.parallel.sharding import fit_restarts_sharded

                m.pad_for_mesh(mesh_obj)  # arbitrary Nt: masked dead rows
                losses, best = fit_restarts_sharded(
                    m, mesh_obj, num_restarts=num_restarts,
                    num_iter=restart_iter, progress=progress,
                )
            else:
                from tapqir_tpu.parallel.restarts import fit_restarts

                losses, best = fit_restarts(
                    m, num_restarts=num_restarts, num_iter=restart_iter,
                    progress=progress,
                )
            logger.info(f"Selected restart #{best}")
            import json as _json

            with open(m.run_path / f"{m.name}_restarts.json", "w") as fh:
                _json.dump(
                    {
                        "num_restarts": num_restarts,
                        "restart_iter": restart_iter,
                        "best_chain": int(best),
                        "final_losses": [float(x) for x in losses[:, -1]],
                    },
                    fh,
                )
            m.save_checkpoint()
            # ... then continue the winning chain to num_iter/convergence
            logger.info("Continuing the winning chain ...")

        if mesh_obj is not None:
            m.use_mesh(mesh_obj)
        m.run(num_iter, progress_bar=_progress())
    except TpuOutOfMemoryError:
        logger.exception("Failed to fit the data")
        sys.exit(1)
    logger.info("Fitting the data: Done")

    logger.info("Computing stats ...")
    m.compute_stats(save_matlab=matlab)
    logger.info("Computing stats: Done")
    return 0


@app.command()
@click.option("--model", type=click.Choice(AVAIL_MODELS),
              default=lambda: get_default("model", "cosmos"),
              help="Tapqir model")
@click.option("-S", "--num-states", "S", type=int,
              default=lambda: get_default("S", 1))
@click.option("--cpu/--cuda", "cpu", default=False)
@click.option("--nbatch-size", "-n", type=int,
              default=lambda: get_default("nbatch-size", 10))
@click.option("--fbatch-size", "-f", type=int,
              default=lambda: get_default("fbatch-size", 512))
@click.option("--k-max", "-k", type=int,
              default=lambda: get_default("k-max", 2))
@click.option("--matlab", is_flag=True, default=False,
              help="Save parameters in matlab format")
@click.option("--dtype", type=click.Choice(["float32", "double"]),
              default="float32")
@click.option("--mesh", type=str, default="auto",
              help="Multi-chip mesh for the posterior-marginal computation "
                   "('auto', 'none', or 'AxB')")
@click.option("--no-input", is_flag=True, default=False)
def stats(model, S, cpu, nbatch_size, fbatch_size, k_max, matlab, dtype,
          mesh, no_input):
    """Compute credible intervals and other statistics
    (reference: tapqir/main.py:488-576)."""
    from tapqir_tpu.exceptions import TapqirFileNotFoundError

    logger = logging.getLogger("tapqir")
    cd = DEFAULTS["cd"]

    if not no_input:  # reference prompts (tapqir/main.py:488-540)
        ask = _make_prompter()
        model = ask("model", model, "Tapqir model",
                    cast=click.Choice(AVAIL_MODELS))
        cpu = not ask("cpu", not cpu, "Run computations on the accelerator?",
                      is_bool=True)
        matlab = ask("matlab", matlab, "Save parameters in matlab format?",
                     is_bool=True)

    logger.info("Computing stats ...")
    m = _make_model(model, S, k_max, cpu, dtype)
    try:
        m.load(cd)
        m.init(DEFAULTS.get("learning-rate", 0.005), nbatch_size, fbatch_size)
        m.load_checkpoint(param_only=True)
    except TapqirFileNotFoundError as err:
        logger.exception(f"Failed to load {err.name} file")
        sys.exit(1)
    mesh_obj = None if cpu else _resolve_mesh(m, mesh, logger)
    if mesh_obj is not None:
        m.pad_for_mesh(mesh_obj)  # arbitrary Nt: masked dead rows
        m._mesh = mesh_obj  # shard the posterior-marginal blocks only
    m.compute_stats(save_matlab=matlab)
    logger.info("Computing stats: Done")
    return 0


@app.command()
@click.option("--model", type=click.Choice(AVAIL_MODELS), default="cosmos")
@click.option("-n", "n", type=int, default=0, help="AOI index to display")
@click.option("--f1", type=int, default=0, help="First frame")
@click.option("--f2", type=int, default=None, help="Last frame")
@click.option("--num-frames", type=int, default=15,
              help="Number of AOI images shown in the strip")
def show(model, n, f1, f2, num_frames):
    """Render the AOI viewer figure for one AOI (static export of the
    reference's interactive viewer, tapqir/main.py:607-870)."""
    from tapqir_tpu.exceptions import TapqirFileNotFoundError
    from tapqir_tpu.gui import render_aoi_figure

    logger = logging.getLogger("tapqir")
    cd = DEFAULTS["cd"]
    try:
        out = render_aoi_figure(cd, model, n, f1, f2, num_frames)
    except TapqirFileNotFoundError as err:
        logger.exception(f"Failed to load {err.name} file")
        sys.exit(1)
    logger.info(f"Saved AOI viewer figure in {out}")
    return 0


@app.command()
def log():
    """Show logging info (reference: tapqir/main.py:873-883)."""
    import pydoc

    log_file = Path(DEFAULTS["cd"]) / ".tapqir" / "loginfo"
    with open(log_file, "r") as f:
        pydoc.pager(f.read())


@app.command()
def subset():
    """Create a new dataset from the AOIs listed in ``aoi_subset.txt``
    (reference: tapqir/main.py:886-923)."""
    from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, load, save

    logger = logging.getLogger("tapqir")
    path = Path(DEFAULTS["cd"])
    subset_path = path / "subset"
    subset_path.mkdir(exist_ok=True)

    data = load(path)
    with open(path / "aoi_subset.txt", "r") as f:
        line = f.readline().rstrip("\n")
        idx = [int(i.strip()) for i in line.split(",")]

    subset_data = CosmosDataset(
        images=data.images[idx],
        xy=data.xy[idx],
        is_ontarget=data.is_ontarget[idx],
        mask=data.mask[idx],
        labels=data.labels,
        offset=OffsetData(data.offset.samples, data.offset.weights),
        time1=data.time1,
        ttb=data.ttb,
        name=data.name,
        channels=data.channels,
    )
    save(subset_data, subset_path)
    logger.info("Created a new data file at `subset/data.tpqr`")


@app.command()
@click.option("--model", type=click.Choice(AVAIL_MODELS),
              default=lambda: get_default("model", "cosmos"))
@click.option("-S", "--num-states", "S", type=int,
              default=lambda: get_default("S", 1))
@click.option("--k-max", "-k", type=int,
              default=lambda: get_default("k-max", 2))
@click.option("--binary/--probabilistic", "binary", default=False,
              help="Plot a binary or probabilistic rastergram")
@click.option("--cpu/--cuda", "cpu", default=False)
@click.option("--num-samples", "-n", type=int, default=2000,
              help="Number of posterior samples")
@click.option("--num-iter", "-it", type=int, default=15000,
              help="Number of MLE iterations")
def ttfb(model, S, k_max, binary, cpu, num_samples, num_iter):
    """Time-to-first-binding analysis (reference: tapqir/main.py:926-1147)."""
    import pandas as pd

    from tapqir_tpu.exceptions import TapqirFileNotFoundError
    from tapqir_tpu.models import models
    from tapqir_tpu.utils.imscroll import time_to_first_binding
    from tapqir_tpu.utils.mle_analysis import ttfb_mle
    from tapqir_tpu.utils.stats import hpdi

    logger = logging.getLogger("tapqir")
    cd = Path(DEFAULTS["cd"])

    m = models[model](S=S, K=k_max, device=_device_settings(cpu),
                      dtype="float32")
    try:
        m.load(cd, data_only=False)
        m.init(DEFAULTS.get("learning-rate", 0.005),
               DEFAULTS.get("nbatch-size", 10), DEFAULTS.get("fbatch-size", 512))
        m.load_checkpoint(param_only=True)
    except TapqirFileNotFoundError as err:
        logger.exception(f"Failed to load {err.name} file")
        sys.exit(1)

    p_specific = _stats_array(m, "p_specific")
    z = (p_specific > 0.5) if binary else p_specific
    r_type = "binary" if binary else "probabilistic"
    z_samples = m.z_sample(num_samples=num_samples)
    mask = m.data.mask[: m.data.N]
    z_samples_masked = z_samples[:, mask]
    for c in range(m.data.C):
        logger.info(f"Channel #{c} ({m.data.channels[c]})")
        z_masked = z[: m.data.N, :, c][mask]
        ttfb_vals = time_to_first_binding(z_masked)
        sdx = np.argsort(-ttfb_vals)

        _plot_rastergram(
            z_masked[sdx], cd / f"{m.name}_ttfb-rastergram-channel{c}.png",
            f"Channel {c}",
        )
        logger.info(
            f"Saved a {r_type} rastergram in {m.name}_ttfb-rastergram-channel{c}.png"
        )

        Tmax = m.data.F
        data = time_to_first_binding(z_samples_masked[..., c])
        pd.DataFrame(data=data).to_csv(
            cd / f"{m.name}_ttfb-data-points-channel{c}.csv"
        )

        fit = ttfb_mle(data, None, Tmax, lr=5e-3, n_steps=num_iter)

        results = pd.DataFrame(columns=["Mean", "95% LL", "95% UL"])
        for par in ("ka", "kns", "Af"):
            vals = fit[par].squeeze(-1)
            ll, ul = hpdi(vals, 0.95)
            results.loc[par, "Mean"] = float(vals.mean())
            results.loc[par, "95% LL"] = float(ll)
            results.loc[par, "95% UL"] = float(ul)
        results.to_csv(cd / f"{m.name}_ttfb-params-channel{c}.csv")
        logger.info(f"Saved fit parameters in {m.name}_ttfb-params-channel{c}.csv")

        # fraction bound vs best fit (reference: main.py:1073-1147)
        nz = (data == 0).sum(1, keepdims=True)
        N = data.shape[1]
        t = np.arange(Tmax)
        fraction_bound = (data[..., None] < t).mean(1)
        fb_ll, fb_ul = np.quantile(fraction_bound, [0.025, 0.975], axis=0)
        fb_mean = fraction_bound.mean(0)
        ka_m = results.loc["ka", "Mean"]
        kns_m = results.loc["kns", "Mean"]
        Af_m = results.loc["Af", "Mean"]
        best_fit = (
            nz / N
            + (1 - nz / N)
            * (
                Af_m * (1 - np.exp(-(ka_m + kns_m) * t))
                + (1 - Af_m) * (1 - np.exp(-kns_m * t))
            )
        ).mean(0)
        pd.DataFrame(
            data={
                "time": t,
                "best fit": best_fit,
                "fraction bound mean": fb_mean,
                "fraction bound 95% ll": fb_ll,
                "fraction bound 95% ul": fb_ul,
            }
        ).to_csv(cd / f"{m.name}_ttfb-fraction-bound-channel{c}.csv")
        _plot_fraction_bound(
            t, fb_mean, fb_ll, fb_ul, best_fit,
            cd / f"{m.name}_ttfb-plot-channel{c}.png", f"Channel {c}",
        )
        logger.info(f"Saved data plots in {m.name}_ttfb-plot-channel{c}.png")
    return 0


@app.command()
@click.option("--model", type=click.Choice(AVAIL_MODELS),
              default=lambda: get_default("model", "cosmos"))
@click.option("-S", "--num-states", "S", type=int,
              default=lambda: get_default("S", 1))
@click.option("--k-max", "-k", type=int,
              default=lambda: get_default("k-max", 2))
@click.option("-K", "--num-exponentials", "K", type=int, default=3,
              help="Number of exponentials")
@click.option("--cpu/--cuda", "cpu", default=False)
@click.option("--num-samples", "-n", type=int, default=500)
@click.option("--num-iter", "-it", type=int, default=10000)
def dwelltime(model, S, k_max, K, cpu, num_samples, num_iter):
    """Dwell-time analysis: kon / koff from K-exponential MLE fits
    (reference: tapqir/main.py:1150-1384)."""
    import pandas as pd
    from scipy.io import savemat

    from tapqir_tpu.exceptions import TapqirFileNotFoundError
    from tapqir_tpu.models import models
    from tapqir_tpu.utils.imscroll import (
        bound_dwell_times,
        count_intervals,
        unbound_dwell_times,
    )
    from tapqir_tpu.utils.mle_analysis import exp_mle
    from tapqir_tpu.utils.stats import hpdi

    logger = logging.getLogger("tapqir")
    cd = Path(DEFAULTS["cd"])

    m = models[model](S=S, K=k_max, device=_device_settings(cpu),
                      dtype="float32")
    try:
        m.load(cd, data_only=False)
        m.init(DEFAULTS.get("learning-rate", 0.005),
               DEFAULTS.get("nbatch-size", 10), DEFAULTS.get("fbatch-size", 512))
        m.load_checkpoint(param_only=True)
    except TapqirFileNotFoundError as err:
        logger.exception(f"Failed to load {err.name} file")
        sys.exit(1)

    z_samples = m.z_sample(num_samples=num_samples)
    mask = m.data.mask[: m.data.N]
    z_samples_masked = z_samples[:, mask]
    z_map = _stats_array(m, "z_map")
    for c in range(m.data.C):
        logger.info(f"Channel #{c} ({m.data.channels[c]})")
        intervals = count_intervals(z_samples_masked[..., c])
        intervals.to_pickle(cd / f"{m.name}_dwelltime-intervals-channel{c}.pkl")
        savemat(
            cd / f"{m.name}_dwelltime-intervals-channel{c}.mat",
            intervals.to_dict("list"),
        )
        logger.info(f"Saved time intervals in {m.name}_dwelltime-intervals-channel{c}")

        z_map_intervals = count_intervals(z_map[: m.data.N][None, mask, :, c])
        for state, tag, rate_name in (
            (1, "bound", "koff"),
            (0, "unbound", "kon"),
        ):
            logger.info(f"{rate_name} calculation ...")
            dt = (
                bound_dwell_times(intervals)
                if state
                else unbound_dwell_times(intervals)
            )
            fit = exp_mle(dt, K, lr=5e-3, n_steps=num_iter)
            results = pd.DataFrame(columns=["Mean", "95% LL", "95% UL"])
            for i in range(K):
                for key, col in (("A", f"A{i}"), ("k", f"{rate_name}{i}")):
                    vals = fit[key][:, i]
                    ll, ul = hpdi(vals, 0.95)
                    results.loc[col, "Mean"] = float(vals.mean())
                    results.loc[col, "95% LL"] = float(ll)
                    results.loc[col, "95% UL"] = float(ul)
            results.to_csv(cd / f"{m.name}_dwelltime-{rate_name}-channel{c}.csv")
            logger.info(
                f"Saved {rate_name} parameters in "
                f"{m.name}_dwelltime-{rate_name}-channel{c}.csv"
            )
            _plot_dwelltime_hist(
                (
                    bound_dwell_times(z_map_intervals)
                    if state
                    else unbound_dwell_times(z_map_intervals)
                )[0],
                fit, K,
                cd / f"{m.name}_dwelltime-{tag}-histogram-channel{c}.png",
                f"{tag.capitalize()} dwell times channel {c}",
            )
    return 0


# -- plotting helpers (best-effort; never fail the pipeline) -------------------


def _stats_array(model, key):
    """Fetch a posterior-summary array from the loaded params_stats npz."""
    stats = model.params_stats
    if key in stats:
        return np.asarray(stats[key])
    return np.asarray(stats[f"{key}"])


def _plot_rastergram(z_sorted, out_path, title):
    if os.environ.get("CI"):
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.imshow(z_sorted, vmin=0, vmax=1, aspect="auto", interpolation="none")
        ax.set_xlabel("Time (frame)")
        ax.set_ylabel("AOI")
        ax.set_title(title)
        fig.savefig(out_path, dpi=300)
        plt.close(fig)
    except Exception as err:  # pragma: no cover
        logging.getLogger("tapqir").warning(f"plotting failed: {err}")


def _plot_fraction_bound(t, fb_mean, fb_ll, fb_ul, best_fit, out_path, title):
    if os.environ.get("CI"):
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.fill_between(t, fb_ll, fb_ul, alpha=0.3, color="C2")
        ax.plot(t, fb_mean, color="C2", label="fraction bound")
        ax.plot(t, best_fit, color="k", label="best fit")
        ax.set_xlabel("Time (frame)")
        ax.set_ylabel("Cumulative fraction")
        ax.set_ylim(-0.05, 1.05)
        ax.set_title(title)
        ax.legend()
        fig.savefig(out_path, dpi=300)
        plt.close(fig)
    except Exception as err:  # pragma: no cover
        logging.getLogger("tapqir").warning(f"plotting failed: {err}")


def _plot_dwelltime_hist(dt, fit, K, out_path, title):
    if os.environ.get("CI"):
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        vals = dt[dt > 0]
        if vals.size:
            ax.hist(vals, bins=min(100, max(10, int(vals.max()))), density=True)
        t = np.arange(max(2, int(dt.max())))
        y = 0
        for i in range(K):
            A_i = float(fit["A"][:, i].mean())
            k_i = float(fit["k"][:, i].mean())
            y = y + A_i * k_i * np.exp(-k_i * t)
            ax.plot(A_i * k_i * np.exp(-k_i * t), "k--")
        ax.plot(y, "k-")
        ax.set_xlabel("Time interval (frame)")
        ax.set_ylabel("Density")
        ax.set_title(title)
        fig.savefig(out_path, dpi=300)
        plt.close(fig)
    except Exception as err:  # pragma: no cover
        logging.getLogger("tapqir").warning(f"plotting failed: {err}")


if __name__ == "__main__":
    app()
