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


def make_sharded_grads_fn(model, mesh):
    """Build the shard_map'd ``(params, key, data) -> (loss, grads)`` step.

    Each shard folds the step key with its shard id, computes its local ELBO
    terms, and the loss plus every gradient are psum'd over exactly the mesh
    axes the corresponding parameter is replicated over.
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

    # a gradient must be psum'd over exactly the mesh axes its parameter is
    # NOT sharded over: e.g. background_mean_loc is P("aoi", None, None) -
    # every frame shard holds the same aoi-slice but computes a different
    # local likelihood gradient, so the contributions must be summed over
    # "frame" (dropping them silently loses those shards' data)
    psum_axes = {
        k: tuple(ax for ax in axes if ax not in _spec_axes(spec))
        for k, spec in param_specs.items()
    }

    # a frame-coupled model (hmm: the z-chain spans all frames) must pick the
    # same AOI batch on every frame shard of a mesh row and run its chain
    # terms with cross-shard boundary collectives (models/hmm.py:elbo)
    frame_coupled = bool(getattr(model, "frame_coupled", False))

    def local_loss(params_local, key, data_local, key_ndx):
        kwargs = {}
        if frame_coupled:
            kwargs["key_ndx"] = key_ndx
            kwargs["frame_axis"] = "frame" if frame_shards > 1 else None
        return -model.elbo(
            params_local, key, data_local,
            n_shards=n_shards, frame_shards=frame_shards, **kwargs,
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(), data_specs),
        out_specs=(P(), param_specs),
    )
    def loss_and_grads(params_local, key, data_local):
        shard_id = jax.lax.axis_index("aoi") * jax.lax.axis_size(
            "frame"
        ) + jax.lax.axis_index("frame")
        key_ndx = jax.random.fold_in(key, jax.lax.axis_index("aoi"))
        key = jax.random.fold_in(key, shard_id)
        loss, grads = jax.value_and_grad(local_loss)(
            params_local, key, data_local, key_ndx
        )
        loss = jax.lax.psum(loss, axes)
        grads = {
            k: jax.lax.psum(g, psum_axes[k]) if psum_axes[k] else g
            for k, g in grads.items()
        }
        return loss, grads

    return loss_and_grads


def make_sharded_train_fn(model, mesh, tx):
    """Build a jitted multi-step train function over the mesh.

    Returns ``run_chunk(params, opt_state, key, data, nsteps) ->
    (params, opt_state, losses)`` where params/data are sharded per
    ``model.param_partition()`` / :func:`data_partition`.
    """
    loss_and_grads = make_sharded_grads_fn(model, mesh)

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
