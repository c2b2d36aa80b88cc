"""Simulate datasets from the generative models (reference: tapqir/utils/simulate.py).

Pure-JAX ancestral sampling: fixed physical parameters in, CosmosDataset with
ground-truth z labels out. Regimes match the reference:

* ``pi``                -> time-independent cosmos states
* ``alpha`` (+ ``pi``)  -> crosstalk (Q dyes bleeding into C channels)
* ``kon``/``koff`` or ``init``/``trans`` -> kinetic (HMM) state chain
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tapqir_tpu.distributions.core import affine_beta_sample
from tapqir_tpu.distributions.ksmogn import ksmogn_sample
from tapqir_tpu.distributions.util import probs_m
from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData

__all__ = ["simulate"]


def _sample_z_iid(key, pi, N, F, Q, is_ontarget):
    """z ~ Categorical([1-pi, pi]) for on-target AOIs, 0 for off-target."""
    z = jax.random.bernoulli(key, pi, shape=(N, F, Q)).astype(jnp.int32)
    return jnp.where(is_ontarget[:, None, None], z, 0)


def _sample_z_markov(key, init, trans, N, F, Q, is_ontarget):
    """z_0 ~ init; z_f ~ trans[z_{f-1}] - vectorized over AOIs/dyes via scan."""
    k0, k1 = jax.random.split(key)
    z0 = jax.random.categorical(k0, jnp.log(init), shape=(N, Q))  # init (Q, S+1)

    def step(z_prev, key_f):
        logits = jnp.log(trans)[jnp.arange(Q)[None, :], z_prev]  # (N, Q, S+1)
        z_next = jax.random.categorical(key_f, logits)
        return z_next, z_next

    keys = jax.random.split(k1, F - 1)
    _, zs = jax.lax.scan(step, z0, keys)
    z = jnp.concatenate([z0[None], zs], axis=0).transpose(1, 0, 2)  # (N, F, Q)
    return jnp.where(is_ontarget[:, None, None], z, 0)


def simulate(
    model: str,
    N: int,
    F: int,
    C: int = 1,
    P: int = 14,
    seed: int = 0,
    params: Optional[dict] = None,
    K: int = 2,
) -> CosmosDataset:
    """Simulate a new dataset (reference: tapqir/utils/simulate.py:12-138).

    :param model: "cosmos", "crosstalk", or "cosmos+hmm" (regime is actually
        selected by the keys in ``params``, matching the reference).
    :param N: total AOIs; the first half is on-target, second half off-target.
    :param params: fixed parameter values; required keys: gain, lamda,
        proximity, offset, height, background, width, plus one of
        {pi}, {alpha, pi}, {kon, koff} or {init, trans}.
    """
    del model  # regime is determined by params keys, as in the reference
    params = dict(params or {})
    Q = C
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)

    is_ontarget = np.zeros((N,), dtype=bool)
    is_ontarget[: N // 2] = True
    is_ontarget_j = jnp.asarray(is_ontarget)

    gain = float(params["gain"])
    lamda = jnp.full((Q,), float(params["lamda"]))
    proximity = float(params["proximity"])
    height = float(params["height"])
    width = float(params["width"])
    background = float(params["background"])
    offset_val = float(params["offset"])

    # --- discrete states ----------------------------------------------------
    if ("kon" in params and "koff" in params) or ("init" in params and "trans" in params):
        if "kon" in params:
            kon, koff = float(params["kon"]), float(params["koff"])
            init = jnp.broadcast_to(
                jnp.array([koff / (kon + koff), kon / (kon + koff)]), (Q, 2)
            )
            trans = jnp.broadcast_to(
                jnp.array([[1 - kon, kon], [koff, 1 - koff]]), (Q, 2, 2)
            )
        else:
            init = jnp.asarray(params["init"]).reshape(Q, -1)
            trans = jnp.asarray(params["trans"]).reshape(Q, init.shape[-1], init.shape[-1])
        z = _sample_z_markov(keys[0], init, trans, N, F, Q, is_ontarget_j)
    else:
        pi = float(params["pi"])
        z = _sample_z_iid(keys[0], pi, N, F, Q, is_ontarget_j)

    # --- theta | z: z=0 -> theta=0; z>0 -> uniform over {1..K} ---------------
    theta_pos = 1 + jax.random.randint(keys[1], (N, F, Q), 0, K)
    theta = jnp.where(z > 0, theta_pos, 0)

    # --- m | theta, lamda ----------------------------------------------------
    pm_table = probs_m(lamda, K)  # (Q, 1+K, K)
    qdx = jnp.arange(Q)
    pm = pm_table[qdx[None, None, :, None], theta[..., None], jnp.arange(K)]  # (N,F,Q,K)
    m = jax.random.bernoulli(keys[2], pm).astype(jnp.float32)

    # --- spot shapes ----------------------------------------------------------
    size_ns = 2.0
    size_sp = ((P + 1) / (2 * proximity)) ** 2 - 1
    spec = (theta[..., None] == 1 + jnp.arange(K)).astype(jnp.float32)  # (N,F,Q,K)
    size = jnp.where(spec > 0, size_sp, size_ns)
    lim = (P + 1) / 2
    x = affine_beta_sample(keys[3], 0.0, size, -lim, lim)
    y = affine_beta_sample(keys[4], 0.0, size, -lim, lim)
    h = jnp.full((N, F, Q, K), height)
    w = jnp.full((N, F, Q, K), width)
    b = jnp.full((N, F, C), background)
    target_locs = jnp.full((N, F, C, 2), (P - 1) / 2)

    offset_samples = jnp.full((3,), offset_val)
    offset_logits = jnp.log(jnp.ones(3) / 3)

    # --- images ----------------------------------------------------------------
    alpha = jnp.asarray(params["alpha"], jnp.float32).reshape(Q, C) if "alpha" in params else None
    data = ksmogn_sample(
        keys[5],
        h,
        w,
        x,
        y,
        target_locs,
        b,
        gain,
        offset_samples,
        offset_logits,
        P,
        m,
        alpha,
    )
    data = jnp.floor(data)

    # --- ground-truth labels (on-target half) ----------------------------------
    n_lab = N // 2
    labels = np.zeros((n_lab, F, Q), dtype=[("aoi", int), ("frame", int), ("z", int)])
    labels["aoi"] = np.arange(n_lab).reshape(-1, 1, 1)
    labels["frame"] = np.arange(F).reshape(-1, 1)
    labels["z"] = np.asarray(z[:n_lab])

    return CosmosDataset(
        images=np.asarray(data, np.float32),
        xy=np.asarray(target_locs, np.float32),
        is_ontarget=is_ontarget,
        labels=labels,
        offset=OffsetData(
            np.full((3,), offset_val, np.float64), np.ones(3, np.float64) / 3
        ),
        name="simulated",
    )
