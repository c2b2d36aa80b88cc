"""Mesh sharding for pod-scale SVI.

The reference is single-process/single-device (SURVEY.md section 2.10, 5.8);
its only "parallelism" is plate subsampling. The TPU-native scaling story:

* a 2D ``jax.sharding.Mesh`` with axes ("aoi", "frame");
* the dataset and all per-AOI/per-frame variational parameters are sharded
  over it (data parallel over AOIs + frames - frames are iid in cosmos /
  crosstalk, so the frame axis is also data-parallel);
* each shard draws its own local minibatch and computes local ELBO terms;
  the scalar loss and the gradients of *replicated* (global) parameters are
  ``psum``'d over ICI; gradients of sharded parameters never leave the chip;
* each shard draws its own MC sample of the global parameters (gain, pi,
  lamda, proximity) and the global prior/entropy term is averaged over
  shards - i.e. the mesh acts as ``n_shards`` iid ELBO particles, an
  unbiased (variance-reduced) version of the reference's single-draw step.

Optimizer updates run outside shard_map: Adam is elementwise, so sharded
parameters update locally and replicated parameters update identically on
every device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map


def make_mesh(n_aoi: int, n_frame: int = 1, devices=None) -> Mesh:
    """Build an ("aoi", "frame") mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_aoi * n_frame, (
        f"need {n_aoi * n_frame} devices, have {devices.size}"
    )
    grid = devices.ravel()[: n_aoi * n_frame].reshape(n_aoi, n_frame)
    return Mesh(grid, ("aoi", "frame"))


def data_partition() -> dict:
    """PartitionSpecs for the device-resident dataset arrays.

    All models use the lane-padded flat image layout (Nt, F, C, EVP)
    (Model._device_image_stack); the sharded path always uses the
    UNEXTENDED stack (no cyclic frame extension), which the model ELBOs
    detect from the array shapes."""
    return {
        "images": P("aoi", "frame", None, None),
        "xy": P("aoi", "frame"),
        "is_ontarget": P("aoi"),
        "mask": P("aoi"),
        "offset_samples": P(),
        "offset_logits": P(),
    }


def shard_params_and_data(mesh, params, param_specs, data, data_specs=None):
    """Place params/data on the mesh with their PartitionSpecs."""
    data_specs = data_specs or data_partition()
    params_sh = {
        k: jax.device_put(v, NamedSharding(mesh, param_specs[k]))
        for k, v in params.items()
    }
    data_sh = {
        k: jax.device_put(v, NamedSharding(mesh, data_specs[k]))
        for k, v in data.items()
    }
    return params_sh, data_sh


def make_sharded_grads_fn(model, mesh, num_restarts=None):
    """Build the shard_map'd ``(params, key, data) -> (loss, grads)`` step.

    Each shard folds the step key with its shard id, computes its local ELBO
    terms, and the loss plus every gradient are psum'd over exactly the mesh
    axes the corresponding parameter is replicated over.

    With ``num_restarts = R``, every parameter carries a leading restart
    axis (replicated over the mesh: chains are independent SVI runs, the
    mesh shards the DATA of each chain), each shard computes the R local
    ELBOs via vmap, and the same per-parameter psums batch over the chain
    axis - so R-chain training composes with any ("aoi", "frame") sharding
    instead of being confined to one device (BASELINE.md's pod-scale
    "batched random restarts" config). Returns (loss: (R,), grads with
    leading R).
    """
    param_specs = model.param_partition()
    data_specs = data_partition()
    n_shards = mesh.devices.size
    frame_shards = int(mesh.shape["frame"])
    axes = ("aoi", "frame")

    def _spec_axes(spec):
        used = set()
        for entry in spec:
            if entry is None:
                continue
            if isinstance(entry, (tuple, list)):
                used.update(entry)
            else:
                used.add(entry)
        return used

    # a gradient must be summed over exactly the mesh axes its parameter is
    # NOT sharded over: e.g. background_mean_loc is P("aoi", None, None) -
    # every frame shard holds the same aoi-slice but computes a different
    # local likelihood gradient. Since jax 0.9's varying-manual-axes (vma)
    # shard_map, `jax.grad` INSIDE shard_map performs this psum itself: the
    # transpose of the implicit broadcast of an axis-invariant input psums
    # the cotangent over those axes (verified: an explicit psum on top
    # multiplies global gradients by the mesh size — the pre-0.9 form of
    # this function did exactly that). Gradients therefore leave
    # value_and_grad already invariant over their replicated axes with the
    # collective issued by AD; the exact-parity tests (test_sharding.py)
    # pin this contract.
    del _spec_axes

    # a frame-coupled model (hmm: the z-chain spans all frames) must pick the
    # same AOI batch on every frame shard of a mesh row and run its chain
    # terms with cross-shard boundary collectives (models/hmm.py:elbo)
    frame_coupled = bool(getattr(model, "frame_coupled", False))

    def local_loss(params_local, key, data_local, key_ndx):
        # key_ndx is shared by the frame shards of a mesh row: they must
        # gather the SAME AOI rows in the same order (the hmm chain demands
        # it; for every model the frame-axis gradient reduction of
        # AOI-replicated parameters is only aligned under a shared draw)
        kwargs = {"key_ndx": key_ndx}
        if frame_coupled:
            kwargs["frame_axis"] = "frame" if frame_shards > 1 else None
        return -model.elbo(
            params_local, key, data_local,
            n_shards=n_shards, frame_shards=frame_shards, **kwargs,
        )

    if num_restarts is None:
        in_param_specs = param_specs
        out_specs = (P(), param_specs)
    else:
        in_param_specs = {
            k: P(*((None,) + tuple(s))) for k, s in param_specs.items()
        }
        out_specs = (P(None), in_param_specs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_param_specs, P(), data_specs),
        out_specs=out_specs,
    )
    def loss_and_grads(params_local, key, data_local):
        shard_id = jax.lax.axis_index("aoi") * jax.lax.axis_size(
            "frame"
        ) + jax.lax.axis_index("frame")
        key_ndx = jax.random.fold_in(key, jax.lax.axis_index("aoi"))
        key = jax.random.fold_in(key, shard_id)

        if num_restarts is None:
            loss, grads = jax.value_and_grad(local_loss)(
                params_local, key, data_local, key_ndx
            )
        else:
            # independent key stream per chain, shared AOI batch per mesh row
            chain_keys = jax.vmap(
                lambda r: jax.random.fold_in(key, r)
            )(jnp.arange(num_restarts))
            chain_key_ndx = jax.vmap(
                lambda r: jax.random.fold_in(key_ndx, r)
            )(jnp.arange(num_restarts))
            loss, grads = jax.vmap(
                lambda p, k, kn: jax.value_and_grad(local_loss)(
                    p, k, data_local, kn
                )
            )(params_local, chain_keys, chain_key_ndx)
        loss = jax.lax.psum(loss, axes)
        # grads: vma-typed AD has already psum'd each gradient over the
        # axes its parameter is replicated on (see note above)
        return loss, grads

    return loss_and_grads


def make_sharded_train_fn(model, mesh, tx, num_restarts=None):
    """Build a jitted multi-step train function over the mesh.

    Returns ``run_chunk(params, opt_state, key, data, nsteps) ->
    (params, opt_state, losses)`` where params/data are sharded per
    ``model.param_partition()`` / :func:`data_partition`. With
    ``num_restarts = R``, params/opt_state carry a leading chain axis and
    ``losses`` has shape (nsteps, R) (see :func:`make_sharded_grads_fn`).
    """
    loss_and_grads = make_sharded_grads_fn(model, mesh, num_restarts)

    def run_chunk(params, opt_state, key, data, nsteps):
        def one_step(carry, k):
            params, opt_state = carry
            loss, grads = loss_and_grads(params, k, data)
            updates, opt_state = tx.update(grads, opt_state)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, nsteps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses

    return jax.jit(run_chunk, static_argnums=(4,))


def restart_param_specs(param_specs):
    """param PartitionSpecs with the leading (mesh-replicated) chain axis."""
    return {k: P(*((None,) + tuple(s))) for k, s in param_specs.items()}


def fit_restarts_sharded(
    model, mesh, num_restarts=4, num_iter=2000, lr=None, perturb=0.0,
    chunk=200, key=None, progress=None,
):
    """Mesh-native batched random restarts: R independent SVI chains, each
    sharded over the full ("aoi", "frame") mesh, in one program.

    The single-device variant (parallel/restarts.py) vmaps chains on one
    chip; this composes the same chain-vmap with the shard_map'd data/param
    sharding, so pod-scale datasets keep batched restarts (BASELINE.md's
    named configuration). Returns (losses (R, num_iter), best index); the
    winning chain's (sharded) params land in ``model.params`` and a fresh
    optimizer state in ``model.opt_state``.
    """
    import optax
    import zlib

    lr = model.lr if lr is None else lr
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    key = jax.random.PRNGKey(0) if key is None else key
    k_perturb, k_run = jax.random.split(key)

    param_specs = model.param_partition()
    r_specs = restart_param_specs(param_specs)

    def stack_param(name, v):
        base = jnp.broadcast_to(v, (num_restarts,) + v.shape)
        if perturb > 0:
            noise = perturb * jax.random.normal(
                jax.random.fold_in(
                    k_perturb, zlib.crc32(name.encode()) % (2**31)
                ),
                base.shape, v.dtype,
            )
            mask = (jnp.arange(num_restarts) > 0).astype(v.dtype)
            base = base + noise * mask.reshape((-1,) + (1,) * v.ndim)
        return base

    params_r = {
        k: jax.device_put(
            stack_param(k, v), NamedSharding(mesh, r_specs[k])
        )
        for k, v in model.params.items()
    }
    _, data_sh = shard_params_and_data(
        mesh, {}, {}, model._data_dev
    )
    opt_state_r = tx.init(params_r)
    run_chunk = make_sharded_train_fn(model, mesh, tx, num_restarts)

    losses_all = []
    done = 0
    while done < num_iter:
        n = min(chunk, num_iter - done)
        k_run, sub = jax.random.split(k_run)
        params_r, opt_state_r, losses = run_chunk(
            params_r, opt_state_r, sub, data_sh, n
        )
        losses_all.append(np.asarray(losses))  # (n, R)
        done += n
        if progress is not None:
            progress(done, float(np.asarray(losses)[-1].min()))

    losses_all = np.concatenate(losses_all, axis=0).T  # (R, num_iter)
    tail = max(1, min(50, num_iter // 10))
    best = int(np.argmin(losses_all[:, -tail:].mean(1)))

    model.params = {k: v[best] for k, v in params_r.items()}
    model.opt_state = model.tx.init(model.params)
    model.iter = getattr(model, "iter", 0) + num_iter
    model.iter_loss = float(losses_all[best, -1])
    return losses_all, best


def make_sharded_probs_fn(model, mesh, num_particles=50):
    """shard_map'd posterior-marginal computation over the mesh.

    Each (aoi, frame) shard evaluates its local (Nt_l, F_l) block of
    z/theta marginals independently (the posterior factorizes over AOIs and
    frames given the variational parameters - no collectives). Returns
    ``probs(params, key, data) -> (z_probs, theta_probs)`` with outputs
    sharded P("aoi", "frame") on their Nt/F axes, mirroring
    ``compute_probs_arrays`` (models/cosmos.py) block-for-block.
    """
    param_specs = model.param_partition()
    data_specs = data_partition()
    S, K, Q = model.S, model.K, model.Q

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(), data_specs),
        out_specs=(
            P("aoi", "frame", None, None),   # z_probs (Nt, F, Q, 1+S)
            P(None, "aoi", "frame", None),   # theta_probs (K, Nt, F, Q)
        ),
    )
    def probs(params_local, key, data_local):
        pc = {k: v for k, v in params_local.items()}
        nt_l = data_local["xy"].shape[0]
        f_l = data_local["xy"].shape[1]
        # every shard must use the same particle keys for its block
        key = jax.random.fold_in(
            key,
            jax.lax.axis_index("aoi") * jax.lax.axis_size("frame")
            + jax.lax.axis_index("frame"),
        )
        constrained = {
            k: model._transforms[k](v) for k, v in pc.items()
        }
        z_p, th_p = model._probs_batch(
            constrained, key, jnp.arange(nt_l), jnp.arange(f_l),
            data_local, num_particles,
        )  # (Z, n, f, Q), (K, n, f, Q)
        z = jnp.transpose(z_p, (1, 2, 3, 0))  # (n, f, Q, 1+S)
        # off-target AOIs are never scored (reference cosmos.py:609-672):
        # zero them so the sharded output matches compute_probs_arrays
        ont = data_local["is_ontarget"].astype(z.dtype)
        z = z * ont[:, None, None, None]
        th = th_p * ont[None, :, None, None]
        return z, th

    return probs
