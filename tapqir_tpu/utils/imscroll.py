"""Kinetic post-analysis of posterior z samples.

Implements the interval/kinetics conventions of Friedman & Gelles 2015
(Methods 86:27-36), matching the reference semantics
(tapqir/utils/imscroll.py:13-317):

* each maximal constant run of a binary trajectory is one interval, coded
  by ``low_or_high``: interior runs keep their state value (0 unbound /
  1 bound); a run censored at the record start is coded ``-state - 2``
  (-2 / -3); a run censored at the record end - including a run spanning
  the whole record - is coded ``state + 2`` (2 / 3);
* dwell-time collections keep only complete (interior) intervals;
* time-to-first-binding, association/dissociation rates from binary
  trajectories; bootstrap confidence intervals.

The implementation here is a vectorized run-length encoding over the
flattened (sample, aoi) records rather than the reference's paired
start/stop masks.

All functions accept numpy or jax arrays (converted to numpy on entry).
"""

import numpy as np
import pandas as pd

__all__ = [
    "count_intervals",
    "bound_dwell_times",
    "unbound_dwell_times",
    "time_to_first_binding",
    "association_rate",
    "dissociation_rate",
    "bootstrap",
    "posterior_estimate",
]


def count_intervals(labels) -> pd.DataFrame:
    r"""Run-length encode binding intervals (reference: imscroll.py:37-73).

    :param labels: (samples, aoi, frames) binary array.
    :return: DataFrame with posterior_sample / aoi / start_frame / stop_frame /
        dwell_time / low_or_high / z columns, one row per maximal constant run,
        in (sample, aoi, start_frame) order.
    """
    z = np.asarray(labels)
    states = z.astype(bool)
    n_samples, n_aois, F = states.shape
    records = states.reshape(n_samples * n_aois, F)

    # A run starts at frame 0 of every record and at every state flip.
    run_starts = np.ones_like(records)
    run_starts[:, 1:] = records[:, 1:] != records[:, :-1]
    record, start = np.nonzero(run_starts)

    # Runs come out in row-major order, so each run extends to just before
    # the next run of the same record, or to the final frame.
    ends_record = np.empty(record.shape, dtype=bool)
    ends_record[:-1] = record[1:] != record[:-1]
    ends_record[-1] = True
    following_start = np.empty_like(start)
    following_start[:-1] = start[1:]
    following_start[-1] = F
    stop = np.where(ends_record, F - 1, following_start - 1)

    state = records[record, start].astype(np.int64)
    # Censoring code: right-censored runs (touching the last frame) take
    # state + 2 - this includes whole-record runs; otherwise left-censored
    # runs take -state - 2; interior runs keep the raw state.
    code = np.where(
        stop == F - 1, state + 2, np.where(start == 0, -state - 2, state)
    )

    sample_idx, aoi_idx = np.divmod(record, n_aois)
    return pd.DataFrame(
        {
            "posterior_sample": sample_idx,
            "aoi": aoi_idx,
            "start_frame": start,
            "stop_frame": stop,
            "dwell_time": stop + 1 - start,
            "low_or_high": code,
            "z": z.reshape(n_samples * n_aois, F)[record, start],
        }
    )


def _dwell_times(intervals: pd.DataFrame, state: int) -> np.ndarray:
    """(samples, max_count) zero-padded dwell times of complete intervals in
    one state (reference: imscroll.py:113-140)."""
    complete = intervals.loc[intervals["low_or_high"] == state]
    groups = complete.groupby("posterior_sample")["dwell_time"]
    lengths = groups.size()
    out = np.zeros((len(lengths), int(lengths.max())), dtype=np.float32)
    for row, (_, times) in enumerate(groups):
        out[row, : len(times)] = times.to_numpy()
    return out


def bound_dwell_times(intervals) -> np.ndarray:
    return _dwell_times(intervals, 1)


def unbound_dwell_times(intervals) -> np.ndarray:
    return _dwell_times(intervals, 0)


def time_to_first_binding(labels) -> np.ndarray:
    r"""Frames elapsed before the first binding event; records with no
    binding are right-censored at F (reference: imscroll.py:143-196).

    Accepts binary z samples OR per-frame binding probabilities q(z=1):
    with probabilities the result is the expected time to first binding,
    :math:`\sum_k k\,q_k \prod_{j<k}(1-q_j) + F \prod_j (1-q_j)`, which
    reduces to the first-bound frame index (or F) for binary input."""
    q = np.asarray(labels, np.float64)
    F = q.shape[-1]
    never_through = np.cumprod(1.0 - q, axis=-1)  # prod_{j<=k}(1-q_j)
    never_before = np.concatenate(
        [np.ones_like(q[..., :1]), never_through[..., :-1]], axis=-1
    )
    k = np.arange(F, dtype=np.float64)
    return (k * q * never_before).sum(-1) + F * never_through[..., -1]


def association_rate(labels) -> np.ndarray:
    """On-rate of a two-state HMM: 0->1 transitions per frame spent unbound;
    binary samples or binding probabilities (expected rate)
    (reference: imscroll.py:199-221)."""
    q = np.asarray(labels, np.float64)
    events = ((1.0 - q[..., :-1]) * q[..., 1:]).sum((-2, -1))
    unbound_frames = (1.0 - q[..., :-1]).sum((-2, -1))
    return events / unbound_frames


def dissociation_rate(labels) -> np.ndarray:
    """Off-rate of a two-state HMM: 1->0 transitions per frame spent bound;
    binary samples or binding probabilities (expected rate)
    (reference: imscroll.py:224-246)."""
    q = np.asarray(labels, np.float64)
    events = (q[..., :-1] * (1.0 - q[..., 1:])).sum((-2, -1))
    bound_frames = q[..., :-1].sum((-2, -1))
    return events / bound_frames


def bootstrap(samples, estimator, repetitions=1000, probs=0.68, rng=None):
    """Bootstrap CI of an estimator (reference: imscroll.py:249-275)."""
    samples = np.asarray(samples)
    rng = np.random.default_rng() if rng is None else rng
    n = len(samples)
    estimates = np.fromiter(
        (
            estimator(samples[rng.integers(0, n, size=n)])
            for _ in range(repetitions)
        ),
        dtype=np.float64,
        count=repetitions,
    )
    lo, hi = np.quantile(estimates, [(1 - probs) / 2, (1 + probs) / 2])
    return lo, hi


def posterior_estimate(sample_fn, estimator, repetitions=1000, probs=0.68):
    """CI over draws from a posterior sampler (reference: imscroll.py:278-293).

    :param sample_fn: callable(i) -> one posterior sample array.
    """
    estimates = np.fromiter(
        (estimator(sample_fn(i)) for i in range(repetitions)),
        dtype=np.float64,
        count=repetitions,
    )
    lo, hi = np.quantile(estimates, [(1 - probs) / 2, (1 + probs) / 2])
    return lo, hi
