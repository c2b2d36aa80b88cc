"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import optax
import pytest

from tapqir_tpu.models import models
from tapqir_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_grads_fn,
    make_sharded_train_fn,
    shard_params_and_data,
)
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "pi": 0.3, "width": 1.4, "gain": 7.0, "lamda": 0.15,
    "proximity": 0.2, "offset": 90.0, "height": 3000, "background": 150,
}


def _model(Nt, F):
    data = simulate("cosmos", N=Nt, F=F, C=1, P=14, seed=0, params=PARAMS)
    model = models["cosmos"]()
    model.data = data
    model.nbatch_size = 2
    model.fbatch_size = 4
    model.init_parameters()
    model._data_dev = model._data_device_arrays()
    return model


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_4x2():
    model = _model(Nt=8, F=8)
    mesh = make_mesh(4, 2)
    tx = optax.adam(0.005)
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, model.param_partition(), model._data_dev
    )
    opt_state = tx.init(params_sh)
    run = make_sharded_train_fn(model, mesh, tx)
    params2, opt_state, losses = run(
        params_sh, opt_state, jax.random.PRNGKey(0), data_sh, 3
    )
    losses = np.asarray(losses)
    assert losses.shape == (3,)
    assert np.isfinite(losses).all()
    # params actually moved
    moved = sum(
        float(np.abs(np.asarray(params2[k]) - np.asarray(params_sh[k])).sum())
        for k in params2
    )
    assert moved > 0
    # sharded per-AOI params keep their sharding
    assert params2["b_loc"].sharding.spec == params_sh["b_loc"].sharding.spec


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_loss_magnitude_matches_single_device():
    """The sharded estimator must target the same objective: compare a
    sharded loss against single-device losses on the same model/data."""
    model = _model(Nt=8, F=8)
    mesh = make_mesh(4, 2)
    tx = optax.adam(0.005)
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, model.param_partition(), model._data_dev
    )
    opt_state = tx.init(params_sh)
    run = make_sharded_train_fn(model, mesh, tx)
    _, _, losses_sh = run(params_sh, opt_state, jax.random.PRNGKey(0), data_sh, 1)

    # single-device minibatch losses (several keys -> MC spread)
    singles = [
        -float(model.elbo(model.params, jax.random.PRNGKey(i), model._data_dev))
        for i in range(8)
    ]
    lo, hi = min(singles), max(singles)
    spread = hi - lo
    loss_sh = float(np.asarray(losses_sh)[0])
    assert lo - 3 * spread < loss_sh < hi + 3 * spread, (
        f"sharded loss {loss_sh} far outside single-device range [{lo}, {hi}]"
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_gradients_match_emulated_2x2():
    """Exact gradient parity: the psum'd sharded gradients must equal the
    gradient of the summed per-shard losses computed on one device.

    Catches the class of bug where a parameter sharded over 'aoi' but
    replicated over 'frame' (e.g. background_mean_loc) silently drops the
    other frame shards' gradient contributions."""
    data = simulate("cosmos", N=4, F=4, C=1, P=14, seed=0, params=PARAMS)
    model = models["cosmos"](dtype="double")
    model.data = data
    model.nbatch_size = 2  # == local shard Nt: deterministic full batch
    model.fbatch_size = 2  # == local shard F
    model.init_parameters()
    model._data_dev = model._data_device_arrays()

    n_aoi, n_frame = 2, 2
    mesh = make_mesh(n_aoi, n_frame)
    param_specs = model.param_partition()
    from tapqir_tpu.parallel.sharding import data_partition

    data_specs = data_partition()
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, param_specs, model._data_dev
    )
    key = jax.random.PRNGKey(7)
    loss_sh, grads_sh = jax.jit(make_sharded_grads_fn(model, mesh))(
        params_sh, key, data_sh
    )
    grads_sh = {k: np.asarray(v) for k, v in grads_sh.items()}

    # single-device emulation: slice exactly like shard_map, fold the key
    # exactly like the sharded step, sum the local losses
    def block(arr, spec, ai, fi):
        idx = []
        for d, entry in enumerate(spec):
            if entry == "aoi":
                b = arr.shape[d] // n_aoi
                idx.append(slice(ai * b, (ai + 1) * b))
            elif entry == "frame":
                b = arr.shape[d] // n_frame
                idx.append(slice(fi * b, (fi + 1) * b))
            else:
                idx.append(slice(None))
        return arr[tuple(idx)]

    def emulated_loss(params_full):
        tot = 0.0
        for ai in range(n_aoi):
            key_ndx = jax.random.fold_in(key, ai)
            for fi in range(n_frame):
                sid = ai * n_frame + fi
                kk = jax.random.fold_in(key, sid)
                pl = {
                    k: block(v, param_specs[k], ai, fi)
                    for k, v in params_full.items()
                }
                dl = {
                    k: block(v, data_specs[k], ai, fi)
                    for k, v in model._data_dev.items()
                }
                tot = tot - model.elbo(
                    pl, kk, dl,
                    n_shards=n_aoi * n_frame, frame_shards=n_frame,
                    key_ndx=key_ndx,
                )
        return tot

    loss_e, grads_e = jax.jit(jax.value_and_grad(emulated_loss))(model.params)
    np.testing.assert_allclose(
        float(loss_sh), float(loss_e), rtol=1e-8,
        err_msg="sharded psum'd loss != summed per-shard losses",
    )
    for k in grads_e:
        np.testing.assert_allclose(
            grads_sh[k], np.asarray(grads_e[k]), rtol=1e-6, atol=1e-8,
            err_msg=f"gradient mismatch for {k} (spec {param_specs[k]})",
        )


def test_graft_entry_single_chip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_fit_restarts_selects_best():
    from tapqir_tpu.parallel.restarts import fit_restarts

    model = _model(Nt=4, F=10)
    model.lr = 0.005
    model.tx = optax.adam(0.005)
    losses, best = fit_restarts(
        model, num_restarts=3, num_iter=100, chunk=50, perturb=0.1
    )
    assert losses.shape == (3, 100)
    assert np.isfinite(losses).all()
    # the winner's trailing loss is the minimum
    tail = losses[:, -10:].mean(1)
    assert best == int(np.argmin(tail))
    # model now carries the winning (un-vmapped) params
    for k, v in model.params.items():
        assert v.shape == model._transforms[k](v).shape
    # and can continue training from there
    model._key = jax.random.PRNGKey(3)
    model._jit = True
    model._build_step()
    p2, o2, l2 = model._run_chunk(model.params, model.opt_state,
                                  jax.random.PRNGKey(4), 5)
    assert np.isfinite(np.asarray(l2)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_prefix_scan_matches_global():
    """Sequence-parallel logmatmulexp prefix scan over a sharded frame axis
    (SURVEY.md section 5.7)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tapqir_tpu.ops.scan import (
        cumulative_logmatmulexp,
        sharded_cumulative_logmatmulexp,
    )

    rng = np.random.default_rng(0)
    n, F, S = 3, 16, 2
    A = rng.dirichlet(np.ones(S), size=(n, F, S)).astype(np.float32)
    logA = jnp.log(jnp.asarray(A))  # (n, F, S, S)

    want = np.asarray(cumulative_logmatmulexp(logA, axis=1))

    mesh = make_mesh(1, 8)  # frame axis sharded over 8 devices

    def body(logA_local):
        return sharded_cumulative_logmatmulexp(logA_local, axis=1, axis_name="frame")

    got = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, "frame", None, None),
            out_specs=P(None, "frame", None, None),
        )
    )(logA)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_train_step_hmm_aoi_mesh():
    """hmm trains over an AOI-sharded mesh (its chain couples frames)."""
    from tapqir_tpu.utils.simulate import simulate as sim

    params = dict(PARAMS)
    del params["pi"]
    params["kon"] = 0.2
    params["koff"] = 0.2
    data = sim("cosmos+hmm", N=8, F=8, C=1, P=14, seed=0, params=params)
    model = models["cosmos+hmm"]()
    model.data = data
    model.nbatch_size = 1
    model.fbatch_size = 8
    model.init_parameters()
    model._data_dev = model._data_device_arrays()

    mesh = make_mesh(8, 1)
    tx = optax.adam(0.005)
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, model.param_partition(), model._data_dev
    )
    opt_state = tx.init(params_sh)
    run = make_sharded_train_fn(model, mesh, tx)
    _, _, losses = run(params_sh, opt_state, jax.random.PRNGKey(0), data_sh, 2)
    losses = np.asarray(losses)
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_sharded_hmm_frame_mesh_matches_emulated_2x2():
    """Exact parity for the frame-sharded hmm step: the psum'd loss and
    gradients on an ("aoi", "frame") mesh must equal the summed per-shard
    losses emulated on one device, with the chain boundary reproduced via
    the elbo's ``chain_prefix`` kwarg (VERDICT: sequence-parallel scan wired
    into the hmm model)."""
    import jax.numpy as jnp

    from tapqir_tpu.ops.scan import cumulative_logmatmulexp
    from tapqir_tpu.parallel.sharding import data_partition
    from tapqir_tpu.utils.simulate import simulate as sim

    params = dict(PARAMS)
    del params["pi"]
    params["kon"] = 0.2
    params["koff"] = 0.2
    data = sim("cosmos+hmm", N=4, F=8, C=1, P=14, seed=0, params=params)
    model = models["cosmos+hmm"](dtype="double")
    model.data = data
    model.nbatch_size = 2  # == local shard Nt: full local batch
    model.fbatch_size = 8
    model.init_parameters()
    model._data_dev = model._data_device_arrays()

    n_aoi, n_frame = 2, 2
    mesh = make_mesh(n_aoi, n_frame)
    param_specs = model.param_partition()
    assert param_specs["z_trans"][1] == "frame"  # frames really shard
    data_specs = data_partition()
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, param_specs, model._data_dev
    )
    key = jax.random.PRNGKey(3)
    loss_sh, grads_sh = jax.jit(make_sharded_grads_fn(model, mesh))(
        params_sh, key, data_sh
    )
    grads_sh = {k: np.asarray(v) for k, v in grads_sh.items()}

    def block(arr, spec, ai, fi):
        idx = []
        for d, entry in enumerate(spec):
            if entry == "aoi":
                b = arr.shape[d] // n_aoi
                idx.append(slice(ai * b, (ai + 1) * b))
            elif entry == "frame":
                b = arr.shape[d] // n_frame
                idx.append(slice(fi * b, (fi + 1) * b))
            else:
                idx.append(slice(None))
        return arr[tuple(idx)]

    def emulated_loss(params_full):
        tot = 0.0
        for ai in range(n_aoi):
            key_ndx = jax.random.fold_in(key, ai)
            # the chain prefix entering frame block 1 = prefix product of
            # block 0's transition matrices for the SAME AOI batch
            ndx = jax.random.permutation(key_ndx, 2)[:2]
            zt_full = model._transforms["z_trans"](params_full["z_trans"])
            zt0 = jnp.take(block(zt_full, param_specs["z_trans"], ai, 0), ndx, 0)
            prefix = cumulative_logmatmulexp(jnp.log(zt0), axis=1)[:, -1]
            for fi in range(n_frame):
                sid = ai * n_frame + fi
                kk = jax.random.fold_in(key, sid)
                pl = {
                    k: block(v, param_specs[k], ai, fi)
                    for k, v in params_full.items()
                }
                dl = {
                    k: block(v, data_specs[k], ai, fi)
                    for k, v in model._data_dev.items()
                }
                tot = tot - model.elbo(
                    pl, kk, dl,
                    n_shards=n_aoi * n_frame, frame_shards=n_frame,
                    key_ndx=key_ndx,
                    chain_prefix=None if fi == 0 else prefix,
                )
        return tot

    loss_e, grads_e = jax.jit(jax.value_and_grad(emulated_loss))(model.params)
    np.testing.assert_allclose(float(loss_sh), float(loss_e), rtol=1e-8)
    for k in grads_e:
        np.testing.assert_allclose(
            grads_sh[k], np.asarray(grads_e[k]), rtol=1e-6, atol=1e-8,
            err_msg=f"gradient mismatch for {k} (spec {param_specs[k]})",
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_hmm_frame_mesh():
    """hmm trains over a 2D ("aoi", "frame") mesh end-to-end."""
    from tapqir_tpu.utils.simulate import simulate as sim

    params = dict(PARAMS)
    del params["pi"]
    params["kon"] = 0.2
    params["koff"] = 0.2
    data = sim("cosmos+hmm", N=8, F=8, C=1, P=14, seed=0, params=params)
    model = models["cosmos+hmm"]()
    model.data = data
    model.nbatch_size = 2
    model.fbatch_size = 8
    model.init_parameters()
    model._data_dev = model._data_device_arrays()

    mesh = make_mesh(4, 2)
    tx = optax.adam(0.005)
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, model.param_partition(), model._data_dev
    )
    opt_state = tx.init(params_sh)
    run = make_sharded_train_fn(model, mesh, tx)
    params2, _, losses = run(params_sh, opt_state, jax.random.PRNGKey(0), data_sh, 3)
    losses = np.asarray(losses)
    assert losses.shape == (3,)
    assert np.isfinite(losses).all()
    def trim(spec):  # XLA may drop trailing Nones from the spec
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    assert trim(params2["z_trans"].sharding.spec) == trim(
        params_sh["z_trans"].sharding.spec
    ) == ("aoi", "frame")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_restarts_match_single_device_vmap():
    """Mesh-sharded batched restarts optimize the same objective as the
    single-device vmapped implementation (parallel/restarts.py): after the
    same iteration budget on the same model, the winning chains' trailing
    losses agree to MC tolerance. Also checks chain independence and that
    the selected params come back as a plain (unstacked) sharded pytree."""
    from tapqir_tpu.parallel.restarts import fit_restarts
    from tapqir_tpu.parallel.sharding import fit_restarts_sharded

    R, iters = 3, 150

    model_s = _model(Nt=8, F=8)
    model_s.tx = optax.adam(0.005)
    model_s.lr = 0.005
    mesh = make_mesh(4, 2)
    losses_sh, best_sh = fit_restarts_sharded(
        model_s, mesh, num_restarts=R, num_iter=iters, chunk=50,
        perturb=0.05, key=jax.random.PRNGKey(11),
    )
    assert losses_sh.shape == (R, iters)
    assert np.isfinite(losses_sh).all()
    tail = max(1, min(50, iters // 10))
    assert best_sh == int(np.argmin(losses_sh[:, -tail:].mean(1)))
    # perturbed chains must actually differ
    assert np.abs(losses_sh[0] - losses_sh[1]).max() > 0
    # winning params are a single (unstacked) pytree usable for further steps
    assert model_s.params["b_loc"].shape == (
        model_s.data.Nt, model_s.data.F, model_s.data.C
    )

    model_v = _model(Nt=8, F=8)
    model_v.tx = optax.adam(0.005)
    model_v.lr = 0.005
    losses_v, best_v = fit_restarts(
        model_v, num_restarts=R, num_iter=iters, chunk=50,
        perturb=0.05, key=jax.random.PRNGKey(11),
    )
    # same objective, same budget: winning trailing losses agree to MC noise
    a = losses_sh[best_sh, -tail:].mean()
    b = losses_v[best_v, -tail:].mean()
    np.testing.assert_allclose(a, b, rtol=0.05)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_probs_match_single_device_blocks():
    """Mesh-sharded posterior marginals must equal the same per-shard blocks
    computed on one device with the same folded keys (float64, exact)."""
    from tapqir_tpu.parallel.sharding import (
        data_partition,
        make_sharded_probs_fn,
    )

    data = simulate("cosmos", N=8, F=8, C=1, P=14, seed=3, params=PARAMS)
    model = models["cosmos"](dtype="double")
    model.data = data
    model.nbatch_size = 2
    model.fbatch_size = 4
    model.init_parameters()
    model._data_dev = model._data_device_arrays()

    mesh = make_mesh(4, 2)
    probs_fn = make_sharded_probs_fn(model, mesh, num_particles=3)
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, model.param_partition(), model._data_dev
    )
    key = jax.random.PRNGKey(5)
    z_sh, th_sh = jax.jit(probs_fn)(params_sh, key, data_sh)
    z_sh, th_sh = np.asarray(z_sh), np.asarray(th_sh)
    assert z_sh.shape == (8, 8, 1, 2)

    # emulate shard-by-shard on one device
    import jax.numpy as jnp

    constrained = {k: model._transforms[k](v) for k, v in model.params.items()}
    specs = data_partition()
    for ai in range(4):
        for fi in range(2):
            nsl = slice(ai * 2, ai * 2 + 2)
            fsl = slice(fi * 4, fi * 4 + 4)
            dloc = dict(model._data_dev)
            dloc["images"] = dloc["images"][nsl, fsl]
            dloc["xy"] = dloc["xy"][nsl, fsl]
            dloc["is_ontarget"] = dloc["is_ontarget"][nsl]
            dloc["mask"] = dloc["mask"][nsl]
            ploc = {}
            for k, v in constrained.items():
                spec = model.param_partition()[k]
                idx = [slice(None)] * v.ndim
                for d, ax in enumerate(spec):
                    if ax == "aoi":
                        idx[d] = nsl
                    elif ax == "frame":
                        idx[d] = fsl
                ploc[k] = v[tuple(idx)]
            kloc = jax.random.fold_in(key, ai * 2 + fi)
            z_p, th_p = model._probs_batch(
                ploc, kloc, jnp.arange(2), jnp.arange(4), dloc, 3
            )
            z_want = np.transpose(np.asarray(z_p), (1, 2, 3, 0))
            ont = np.asarray(dloc["is_ontarget"], np.float64)
            z_want = z_want * ont[:, None, None, None]
            np.testing.assert_allclose(
                z_sh[nsl, fsl], z_want, rtol=1e-12,
                err_msg=f"shard ({ai},{fi})",
            )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_mesh_padding_prime_nt_parity():
    """Arbitrary (prime) AOI counts shard via masked dead-row padding
    (Model.pad_for_mesh): the padded sharded loss/gradients exactly match a
    single-device emulation on the same padded arrays, and dead rows
    receive exactly zero gradient."""
    from tapqir_tpu.parallel.sharding import data_partition
    from tapqir_tpu.utils.dataset import save as save_ds

    data = simulate("cosmos", N=7, F=4, C=1, P=14, seed=0, params=PARAMS)
    model = models["cosmos"](dtype="double")
    model.data = data
    model.path = model.run_path = None
    model.nbatch_size = 2  # == local shard Nt after padding: deterministic
    model.fbatch_size = 4
    model.init_parameters()
    model._data_dev = model._data_device_arrays()
    model.tx = optax.adam(0.005)
    model.opt_state = model._init_opt_state()

    n_aoi = 4
    mesh = make_mesh(n_aoi, 1)
    model.pad_for_mesh(mesh)
    assert model.params["b_loc"].shape[0] == 8
    assert float(model._data_dev["mask"][7]) == 0.0

    param_specs = model.param_partition()
    data_specs = data_partition()
    params_sh, data_sh = shard_params_and_data(
        mesh, model.params, param_specs, model._data_dev
    )
    key = jax.random.PRNGKey(3)
    loss_sh, grads_sh = jax.jit(make_sharded_grads_fn(model, mesh))(
        params_sh, key, data_sh
    )
    grads_sh = {k: np.asarray(v) for k, v in grads_sh.items()}

    # the dead row's parameters receive exactly zero gradient
    for name in ("b_loc", "h_loc", "background_mean_loc"):
        ax = dict(model._window_spec())[name][0]
        sl = [slice(None)] * grads_sh[name].ndim
        sl[ax] = slice(7, 8)
        np.testing.assert_array_equal(
            grads_sh[name][tuple(sl)], 0.0, err_msg=name
        )

    def block(arr, spec, ai):
        idx = []
        for d, entry in enumerate(spec):
            if entry == "aoi":
                b = arr.shape[d] // n_aoi
                idx.append(slice(ai * b, (ai + 1) * b))
            else:
                idx.append(slice(None))
        return arr[tuple(idx)]

    def emulated_loss(params_full):
        tot = 0.0
        for ai in range(n_aoi):
            kk = jax.random.fold_in(key, ai)
            pl = {k: block(v, param_specs[k], ai)
                  for k, v in params_full.items()}
            dl = {k: block(v, data_specs[k], ai)
                  for k, v in model._data_dev.items()}
            tot = tot - model.elbo(pl, kk, dl, n_shards=n_aoi,
                                   frame_shards=1,
                                   key_ndx=jax.random.fold_in(key, ai))
        return tot

    loss_e, grads_e = jax.jit(jax.value_and_grad(emulated_loss))(model.params)
    np.testing.assert_allclose(float(loss_sh), float(loss_e), rtol=1e-8)
    for k in grads_e:
        np.testing.assert_allclose(
            grads_sh[k], np.asarray(grads_e[k]), rtol=1e-6, atol=1e-8,
            err_msg=f"gradient mismatch for {k}",
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_mesh_padding_fit_checkpoint_roundtrip(tmp_path):
    """Prime-Nt mesh fit end-to-end: use_mesh pads, checkpoints are written
    at the REAL dataset size (interchangeable with single-device runs),
    posterior arrays come back unpadded, and a resumed mesh fit re-pads."""
    from tapqir_tpu.utils.dataset import save as save_ds

    data = simulate("cosmos", N=7, F=4, C=1, P=14, seed=1, params=PARAMS)
    save_ds(data, tmp_path)
    model = models["cosmos"]()
    model.load(tmp_path)
    model.init(lr=0.005, nbatch_size=2, fbatch_size=4)
    model.use_mesh(make_mesh(4, 1))
    assert model.params["b_loc"].shape[0] == 8
    model.checkpoint_interval = 2
    model.run(4, progress_bar=lambda it: it)

    with np.load(tmp_path / ".tapqir" / "cosmos_model.tpqr") as z:
        assert z["p::b_loc"].shape[0] == 7
        assert z["mu::h_loc"].shape[1] == 7
    assert model.param("b_loc").shape[0] == 7

    z_p, th_p = model.compute_probs_arrays(num_particles=2)
    assert z_p.shape[0] == 7 and th_p.shape[1] == 7

    # resume on the mesh: checkpoint loads at real size and re-pads
    m2 = models["cosmos"]()
    m2.load(tmp_path)
    m2.init(lr=0.005, nbatch_size=2, fbatch_size=4)
    assert m2.iter == 4
    m2.use_mesh(make_mesh(4, 1))
    assert m2.params["b_loc"].shape[0] == 8
    m2.checkpoint_interval = 2
    m2.run(2, progress_bar=lambda it: it)
    assert m2.iter == 6
