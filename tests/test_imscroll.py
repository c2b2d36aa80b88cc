"""Golden-value tests for kinetics (mirrors reference test/test_imscroll.py)."""

import numpy as np
import pytest

from tapqir_tpu.utils.imscroll import (
    association_rate,
    bootstrap,
    bound_dwell_times,
    count_intervals,
    dissociation_rate,
    time_to_first_binding,
    unbound_dwell_times,
)
from tapqir_tpu.utils.mle_analysis import exp_mle, ttfb_mle


@pytest.mark.parametrize(
    "labels,expected",
    [
        (
            np.array([[False, False, True], [True, False, True]]),
            np.array([[0, 2, -2], [0, 1, 3], [1, 1, -3], [1, 1, 0], [1, 1, 3]]),
        ),
        (
            np.array([[False, True, False], [True, True, False]]),
            np.array([[0, 1, -2], [0, 1, 1], [0, 1, 2], [1, 2, -3], [1, 1, 2]]),
        ),
    ],
)
def test_count_intervals(labels, expected):
    result = count_intervals(labels[None, :, :])
    actual = result[["aoi", "dwell_time", "low_or_high"]].values
    assert (actual == expected).all()


@pytest.mark.parametrize(
    "labels,expected",
    [
        (
            np.array(
                [
                    [False, False, False],
                    [False, False, True],
                    [False, True, True],
                    [True, False, True],
                ]
            ),
            np.array([3.0, 2.0, 1.0, 0.0]),
        ),
    ],
)
def test_time_to_first_binding(labels, expected):
    actual = time_to_first_binding(labels)
    assert (actual == expected).all()


@pytest.mark.parametrize(
    "labels,expected",
    [
        (
            np.array(
                [[False, False, False, True, True], [False, True, True, False, True]]
            ),
            3 / 5,
        ),
        (
            np.array(
                [[True, False, False, False, False], [False, True, True, False, False]]
            ),
            1 / 5,
        ),
    ],
)
def test_association_rate(labels, expected):
    assert association_rate(labels) == expected


@pytest.mark.parametrize(
    "labels,expected",
    [
        (
            np.array(
                [[False, False, False, True, True], [False, True, True, False, True]]
            ),
            1 / 3,
        ),
        (
            np.array(
                [[True, False, False, False, False], [False, True, True, False, False]]
            ),
            2 / 3,
        ),
    ],
)
def test_dissociation_rate(labels, expected):
    assert dissociation_rate(labels) == expected


def test_dwell_times_complete_intervals_only():
    labels = np.array([[[0, 1, 1, 0, 1], [1, 1, 0, 0, 0]]], dtype=bool)
    intervals = count_intervals(labels)
    bound = bound_dwell_times(intervals)
    unbound = unbound_dwell_times(intervals)
    # only complete (low_or_high == +-1) intervals count; censored first/last
    # intervals are excluded (reference: imscroll.py:113-140)
    assert sorted(bound[0][bound[0] > 0].tolist()) == [2.0]
    assert sorted(unbound[0][unbound[0] > 0].tolist()) == [1.0]


def test_bootstrap_mean_ci():
    rng = np.random.default_rng(0)
    samples = rng.normal(5.0, 1.0, size=500)
    lo, hi = bootstrap(samples, np.mean, repetitions=300, rng=rng)
    assert lo < 5.0 < hi
    assert hi - lo < 0.5


def test_ttfb_mle_recovers_rates():
    rng = np.random.default_rng(1)
    ka_true, kns_true, Af_true, Tmax = 0.08, 0.002, 0.9, 400.0
    N = 2000
    active = rng.random(N) < Af_true
    rate = np.where(active, ka_true + kns_true, kns_true)
    tau = rng.exponential(1 / rate)
    data = np.minimum(tau, Tmax)[None, :]
    fit = ttfb_mle(data, None, Tmax, n_steps=4000)
    assert abs(fit["ka"][0, 0] - ka_true) / ka_true < 0.3
    assert 0.7 < fit["Af"][0, 0] <= 1.0


def test_exp_mle_recovers_rate():
    rng = np.random.default_rng(2)
    k_true = 0.25
    data = rng.exponential(1 / k_true, size=(1, 1500))
    fit = exp_mle(data, K=1, n_steps=3000)
    assert abs(fit["k"][0, 0] - k_true) / k_true < 0.15
