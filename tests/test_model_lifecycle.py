"""Model-lifecycle edge cases: OOM mapping, float64 mode, NaN restart."""

import subprocess
import sys

import numpy as np
import pytest

from tapqir_tpu.exceptions import TpuOutOfMemoryError
from tapqir_tpu.models import models
from tapqir_tpu.utils.dataset import save
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "pi": 0.3, "width": 1.4, "gain": 7.0, "lamda": 0.15,
    "proximity": 0.2, "offset": 90.0, "height": 3000, "background": 150,
}


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("lifecycle")
    data = simulate("cosmos", N=2, F=8, C=1, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    return tmp_path


def test_oom_maps_to_typed_exception(tiny):
    """A RESOURCE_EXHAUSTED RuntimeError from the compiled step must surface
    as TpuOutOfMemoryError (whose message advises smaller batch sizes)."""
    model = models["cosmos"]()
    model.load(tiny)
    model.init(lr=0.005, nbatch_size=2, fbatch_size=8)

    def boom(*a, **k):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "137438953472 bytes."
        )

    model._run_chunk = boom
    with pytest.raises(TpuOutOfMemoryError) as ei:
        model.run(10, progress_bar=lambda it: it)
    assert "batch" in str(ei.value).lower()


@pytest.mark.slow
def test_nan_loss_reloads_and_reseeds(tiny, caplog):
    """A NaN loss chunk reloads the previous checkpoint and reseeds the RNG
    (reference: model.py:220-232)."""
    model = models["cosmos"]()
    model.load(tiny)
    model.init(lr=0.005, nbatch_size=2, fbatch_size=8)
    model.run(200, progress_bar=lambda it: it)  # writes a checkpoint
    iter0 = model.iter
    key0 = np.asarray(model._key)

    real_chunk = model._run_chunk
    calls = {"n": 0}

    def nan_once(params, opt_state, key, nsteps):
        calls["n"] += 1
        p, o, losses = real_chunk(params, opt_state, key, nsteps)
        return p, o, losses * np.nan

    # the restart path calls init(), which rebuilds _run_chunk - so the
    # patched chunk only ever produces the first (NaN) result
    model._run_chunk = nan_once
    model.run(200, progress_bar=lambda it: it)
    # the NaN chunk was discarded and retried to completion: iteration count
    # advanced by exactly one checkpoint interval and the RNG was reseeded
    assert calls["n"] == 1
    assert model.iter == iter0 + 200
    assert not np.array_equal(np.asarray(model._key), key0)
    assert np.isfinite(model.iter_loss)


@pytest.mark.slow
def test_dtype_double_enables_x64_fresh_process():
    """`dtype=double` must flip jax_enable_x64 itself (the CLI path); in a
    fresh process without the test conftest, params must come out float64."""
    code = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64
from tapqir_tpu.models import models
from tapqir_tpu.utils.simulate import simulate
m = models["cosmos"](dtype="double")
assert jax.config.jax_enable_x64, "dtype=double did not enable x64"
m.data = simulate("cosmos", N=2, F=4, C=1, P=14, seed=0, params={params!r})
m.nbatch_size, m.fbatch_size = 2, 4
m.init_parameters()
m._data_dev = m._data_device_arrays()
bad = {{k: str(v.dtype) for k, v in m.params.items() if v.dtype.name != "float64"}}
assert not bad, bad
loss = -m.elbo(m.params, jax.random.PRNGKey(0), m._data_dev)
assert loss.dtype.name == "float64", loss.dtype
print("OK", float(loss))
""".format(repo="/root/repo", params=PARAMS)
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os

    env.update({k: v for k, v in os.environ.items()
                if k not in ("JAX_ENABLE_X64", "JAX_PLATFORMS", "XLA_FLAGS")})
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
