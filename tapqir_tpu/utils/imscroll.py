"""Kinetic post-analysis of posterior z samples.

Port of the reference's interval/kinetics math (tapqir/utils/imscroll.py:13-317)
with identical coding conventions:

* intervals are coded -3 (bound) / -2 (unbound) when first in a record,
  3 / 2 when last, 1 / 0 elsewhere (Friedman & Gelles 2015, Methods 86:27-36);
* time-to-first-binding, association/dissociation rates from binary
  trajectories;
* bootstrap confidence intervals.

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
    r"""Count binding interval data (reference: imscroll.py:37-73).

    :param labels: (samples, aoi, frames) binary array.
    :return: DataFrame with posterior_sample / aoi / start_frame / stop_frame /
        dwell_time / low_or_high / z columns.
    """
    z = np.asarray(labels)
    labels = z.astype(bool)
    start_condition = (
        np.concatenate((~labels[..., 0:1], labels[..., :-1]), axis=-1) != labels
    )
    start_sample, start_aoi, start_frame = np.nonzero(start_condition)
    start_type = labels.astype(np.int64)
    start_type[..., 0] = -start_type[..., 0] - 2
    start_type = start_type[start_sample, start_aoi, start_frame]

    stop_condition = np.concatenate(
        (labels[..., :-1] != labels[..., 1:], np.ones_like(labels[..., 0:1])),
        axis=-1,
    )
    stop_sample, stop_aoi, stop_frame = np.nonzero(stop_condition)
    stop_type = labels.astype(np.int64)
    stop_type[..., -1] += 2
    stop_type = stop_type[stop_sample, stop_aoi, stop_frame]

    assert np.array_equal(start_aoi, stop_aoi)

    low_or_high = np.where(abs(start_type) > abs(stop_type), start_type, stop_type)
    z_type = z[start_sample, start_aoi, start_frame]

    return pd.DataFrame(
        data={
            "posterior_sample": start_sample,
            "aoi": start_aoi,
            "start_frame": start_frame,
            "stop_frame": stop_frame,
            "dwell_time": stop_frame + 1 - start_frame,
            "low_or_high": low_or_high,
            "z": z_type,
        }
    )


def _dwell_times(intervals: pd.DataFrame, state: int) -> np.ndarray:
    """(samples, max_count) padded dwell times for one state
    (reference: imscroll.py:113-140)."""
    assert isinstance(intervals, pd.DataFrame)
    mask = intervals["low_or_high"] == state
    result = intervals.loc[mask, ["posterior_sample", "dwell_time"]]
    value_counts = result["posterior_sample"].value_counts()
    max_count = int(value_counts.max())
    n_values = len(value_counts)
    data = np.zeros((n_values, max_count), dtype=np.float32)
    for i in range(n_values):
        sel = result["posterior_sample"] == i
        dwell_times = result.loc[sel, "dwell_time"]
        data[i, : len(dwell_times)] = dwell_times.values
    return data


def bound_dwell_times(intervals) -> np.ndarray:
    return _dwell_times(intervals, 1)


def unbound_dwell_times(intervals) -> np.ndarray:
    return _dwell_times(intervals, 0)


def time_to_first_binding(labels) -> np.ndarray:
    r"""Time elapsed prior to the first binding event
    (reference: imscroll.py:143-196).

    ttfb = sum_f f z_f prod_{f'<f} (1 - z_{f'}) + F prod_f (1 - z_f)
    """
    labels = np.asarray(labels).astype(float)
    F = labels.shape[-1]
    frames = np.arange(1, F + 1)
    q1 = np.ones_like(labels)
    q1[..., :-1] = labels[..., 1:]
    cumq0 = np.cumprod(1 - labels, axis=-1)
    return (frames * q1 * cumq0).sum(-1)


def association_rate(labels) -> np.ndarray:
    """On-rate from binary data assuming a two-state HMM
    (reference: imscroll.py:199-221)."""
    labels = np.asarray(labels).astype(float)
    binding_events = ((1 - labels[..., :-1]) * labels[..., 1:]).sum((-2, -1))
    off_states = (1 - labels[..., :-1]).sum((-2, -1))
    return binding_events / off_states


def dissociation_rate(labels) -> np.ndarray:
    """Off-rate from binary data assuming a two-state HMM
    (reference: imscroll.py:224-246)."""
    labels = np.asarray(labels).astype(float)
    dissociation_events = (labels[..., :-1] * (1 - labels[..., 1:])).sum((-2, -1))
    on_states = labels[..., :-1].sum((-2, -1))
    return dissociation_events / on_states


def bootstrap(samples, estimator, repetitions=1000, probs=0.68, rng=None):
    """Bootstrap CI of an estimator (reference: imscroll.py:249-275)."""
    samples = np.asarray(samples)
    rng = np.random.default_rng() if rng is None else rng
    estimand = np.zeros((repetitions,))
    for i in range(repetitions):
        values = rng.choice(samples, size=len(samples), replace=True)
        estimand[i] = estimator(values)
    return (
        np.quantile(estimand, (1 - probs) / 2),
        np.quantile(estimand, (1 + probs) / 2),
    )


def posterior_estimate(sample_fn, estimator, repetitions=1000, probs=0.68):
    """CI over draws from a posterior sampler (reference: imscroll.py:278-293).

    :param sample_fn: callable(i) -> one posterior sample array.
    """
    estimand = np.zeros((repetitions,))
    for i in range(repetitions):
        estimand[i] = estimator(sample_fn(i))
    return (
        np.quantile(estimand, (1 - probs) / 2),
        np.quantile(estimand, (1 + probs) / 2),
    )
