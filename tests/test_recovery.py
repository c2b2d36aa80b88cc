"""Parameter-recovery tests: fit simulated data, assert the posterior
recovers the generating parameters (VERDICT round 1: the crosstalk
likelihood miscalibration trained "successfully" because no test asserted
recovery; this class of test makes that impossible for all three models).

The fits run in a SUBPROCESS (tests/recovery_driver.py) so they use the
ambient default jax platform - the real TPU when attached (~1 min per fit)
instead of this process's 8-virtual-device CPU backend (~25-40 min per fit;
forced by conftest for the sharding tests). Still marked slow: run with
--runslow.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

DRIVER = Path(__file__).resolve().parent / "recovery_driver.py"

_ambient_alive = None


def _child_env():
    env = dict(os.environ)
    # conftest pins this process to CPU; the child should use the ambient
    # default platform (sitecustomize-registered TPU plugin, or plain CPU)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    return env


def _probe_ambient():
    """One-shot liveness probe of the ambient accelerator. A wedged TPU
    tunnel makes ``jax.devices()`` hang (neither return nor raise), which
    would stall each recovery fit until its 1 h timeout; probe once with a
    short timeout and skip loudly instead."""
    global _ambient_alive
    if _ambient_alive is None:
        try:
            res = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                env=_child_env(), capture_output=True, text=True, timeout=180,
            )
            _ambient_alive = res.returncode == 0
        except subprocess.TimeoutExpired:
            _ambient_alive = False
    if not _ambient_alive:
        pytest.skip("ambient accelerator unavailable (device claim wedged); "
                    "recovery fits would stall until their timeout")


def _run(name):
    _probe_ambient()
    res = subprocess.run(
        [sys.executable, str(DRIVER), name],
        env=_child_env(), capture_output=True, text=True, timeout=3600,
    )
    if res.returncode != 0:
        pytest.fail(
            f"recovery driver [{name}] failed "
            f"(rc={res.returncode}):\n{res.stdout[-2000:]}\n{res.stderr[-4000:]}"
        )


def test_cosmos_recovers_parameters():
    _run("cosmos")


def test_crosstalk_recovers_parameters():
    _run("crosstalk")


def test_hmm_recovers_parameters():
    _run("cosmos+hmm")
