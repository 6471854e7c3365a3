"""Bucket-bound tuner (tools/tune_buckets.py) — the explicit bucket-set
tuning pass of [SURVEY.md §7 hard part 4]."""

import sys

import numpy as np

sys.path.insert(0, "tools")

from tune_buckets import optimal_bounds, waste_for_bounds  # noqa: E402


def test_exact_clusters_zero_waste():
    durs = np.array([1.0, 1.0, 1.0, 4.0, 4.0])
    bounds, waste = optimal_bounds(durs, 2)
    np.testing.assert_allclose(bounds, [1.0, 4.0])
    assert waste < 1e-9
    assert waste_for_bounds(durs, bounds) < 1e-9


def test_more_buckets_never_worse():
    rng = np.random.default_rng(0)
    durs = np.round(rng.uniform(0.5, 12.0, 300), 2)
    prev = np.inf
    for k in (1, 2, 4, 8):
        _, waste = optimal_bounds(durs, k)
        assert waste <= prev + 1e-9
        prev = waste


def test_dp_beats_uniform_split():
    rng = np.random.default_rng(1)
    # bimodal: short utterances + long tail
    durs = np.concatenate([rng.uniform(1, 2, 200), rng.uniform(9, 10, 50)])
    bounds, waste = optimal_bounds(durs, 2)
    uniform = [durs.max() / 2, durs.max()]
    assert waste <= waste_for_bounds(durs, uniform) + 1e-9
    # the optimal split lands between the modes
    assert 1.9 <= bounds[0] <= 9.1
