"""Batched random restarts: vmapped multi-seed SVI.

The reference restarts only reactively (NaN -> reseed,
tapqir/models/model.py:220-232). On TPU, running R independent SVI chains
*simultaneously* is nearly free when the chip is underutilized: all
variational parameters gain a leading restart axis and the whole chunked
train step is vmapped over it, so XLA batches the R chains into one program.
The best chain (lowest trailing -ELBO) is selected at the end - a guard
against bad initializations / local optima (BASELINE.md: "pod-scale ...
batched random restarts").
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["fit_restarts"]


def fit_restarts(
    model,
    num_restarts: int = 4,
    num_iter: int = 2000,
    lr: float = None,
    perturb: float = 0.0,
    chunk: int = 200,
    key=None,
    progress=None,
):
    """Run ``num_restarts`` independent SVI chains in one vmapped program and
    keep the best.

    The model must be loaded and initialized (``model.init(...)``). On
    return, ``model.params`` / ``model.opt_state`` hold the winning chain and
    the full per-chain loss history is returned as an (R, num_iter) array.

    :param perturb: optional stddev of Gaussian jitter added to the
        unconstrained initial parameters of chains 1..R-1 (chain 0 keeps the
        exact default initialization).
    """
    lr = model.lr if lr is None else lr
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    key = jax.random.PRNGKey(0) if key is None else key
    k_perturb, k_run = jax.random.split(key)

    # stack initial params over the restart axis (+ optional jitter)
    def stack_param(name, v):
        base = jnp.broadcast_to(v, (num_restarts,) + v.shape)
        if perturb > 0:
            # crc32 is stable across processes (hash() is salted per run via
            # PYTHONHASHSEED, which would make restarts irreproducible)
            noise = perturb * jax.random.normal(
                jax.random.fold_in(
                    k_perturb, zlib.crc32(name.encode()) % (2**31)
                ),
                base.shape, v.dtype,
            )
            # chain 0 keeps the unperturbed init
            mask = (jnp.arange(num_restarts) > 0).astype(v.dtype)
            base = base + noise * mask.reshape((-1,) + (1,) * v.ndim)
        return base

    params_r = {k: stack_param(k, v) for k, v in model.params.items()}
    opt_state_r = jax.vmap(tx.init)(params_r)
    data = model._data_dev

    def run_chunk(params, opt_state, key, data, nsteps):
        def one_step(carry, k):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda q: -model.elbo(q, k, data)
            )(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, nsteps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses

    vchunk = jax.jit(
        jax.vmap(run_chunk, in_axes=(0, 0, 0, None, None)),
        static_argnums=(4,),
    )

    losses_all = []
    done = 0
    while done < num_iter:
        n = min(chunk, num_iter - done)
        k_run, sub = jax.random.split(k_run)
        keys_r = jax.random.split(sub, num_restarts)
        params_r, opt_state_r, losses = vchunk(
            params_r, opt_state_r, keys_r, data, n
        )
        losses_all.append(np.asarray(losses))  # (R, n)
        done += n
        if progress is not None:
            progress(done, float(np.asarray(losses)[:, -1].min()))

    losses_all = np.concatenate(losses_all, axis=1)  # (R, num_iter)
    # select by trailing-window mean of -ELBO (robust to MC noise)
    tail = max(1, min(50, num_iter // 10))
    score = losses_all[:, -tail:].mean(1)
    best = int(np.argmin(score))

    model.params = {k: v[best] for k, v in params_r.items()}
    # rebuild a fresh (un-vmapped) optimizer state from the winning moments
    adam_r = opt_state_r[0]
    base = model.tx.init(model.params)
    adam = base[0]._replace(
        count=adam_r.count[best],
        mu={k: v[best] for k, v in adam_r.mu.items()},
        nu={k: v[best] for k, v in adam_r.nu.items()},
    )
    model.opt_state = (adam,) + tuple(base[1:])
    model.iter = getattr(model, "iter", 0) + num_iter
    model.iter_loss = float(losses_all[best, -1])
    return losses_all, best
