"""Parallel scan primitives for HMM chain marginalization.

TPU-native replacement for the reference's funsor machinery: the Blelchley
up/down-sweep in tapqir/infer/sum_product.py:273-359 and the hand-rolled
``_sequential_logmatmulexp`` (tapqir/models/hmm.py:480-529) both become a
single ``jax.lax.associative_scan`` over log-transition matrices - O(log F)
depth on device.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = [
    "logmatmulexp",
    "cumulative_logmatmulexp",
    "sharded_cumulative_logmatmulexp",
]


def logmatmulexp(a, b):
    """(..., i, j) @ (..., j, k) in log space, numerically stable."""
    return logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def cumulative_logmatmulexp(log_mats, axis):
    """All prefix products A_0, A_0@A_1, ..., A_0@...@A_{F-1} in log space.

    Equivalent to the reference's ``_sequential_logmatmulexp``
    (tapqir/models/hmm.py:480-529) but expressed as an associative scan,
    which XLA parallelizes across the time dimension.
    """
    return jax.lax.associative_scan(logmatmulexp, log_mats, axis=axis)


def sharded_cumulative_logmatmulexp(log_mats_local, axis, axis_name):
    """Sequence-parallel prefix product over a mesh-sharded time axis.

    The SURVEY's long-context mapping (SURVEY.md section 5.7): when the frame
    dimension is sharded over the mesh, the HMM chain marginalization becomes
    a distributed prefix scan - local Blelloch scan per shard, all_gather of
    per-shard block totals over ICI, then an exclusive prefix of the totals
    combined back into the local results.

    Must be called inside ``shard_map`` with ``axis_name`` bound; each shard
    passes its local (..., F_local, ..., S, S) slice and receives the local
    slice of the GLOBAL prefix products.
    """
    # 1. local prefix scan
    local = cumulative_logmatmulexp(log_mats_local, axis=axis)
    # 2. per-shard block total = last local prefix
    total = jax.lax.index_in_dim(local, local.shape[axis] - 1, axis=axis,
                                 keepdims=False)
    # 3. gather every shard's total (small: (n_shards, ..., S, S))
    totals = jax.lax.all_gather(total, axis_name)
    # 4. exclusive prefix of totals up to this shard
    idx = jax.lax.axis_index(axis_name)
    n_shards = totals.shape[0]
    state_dim = log_mats_local.shape[-1]
    eye_log = jnp.log(
        jnp.eye(state_dim, dtype=log_mats_local.dtype)
        + jnp.finfo(log_mats_local.dtype).tiny
    )
    prefix = jnp.broadcast_to(eye_log, total.shape)
    for k in range(n_shards - 1):  # static unroll; n_shards is small
        prefix = jnp.where(idx > k, logmatmulexp(prefix, totals[k]), prefix)
    # 5. combine: global_prefix[f] = prefix_before_shard @ local_prefix[f]
    return logmatmulexp(jnp.expand_dims(prefix, axis), local)
