"""Property tests: frontier_fn kernels vs independent pandas oracles.

Each lag transform's ``frontier_fn`` (the cogrouped predict engine's
per-step kernel, local_predict.py) must produce the value its Spark window
expression would produce for a row appended to the series. Rather than
spinning a Spark job per example, these compare against pandas' own
rolling/expanding/ewm semantics on the history extended with a NaN frontier
target — an independent implementation of the same reference semantics
(`/root/reference/mlforecast/lag_transforms.py:485-1272`), which the Spark
expressions are separately pinned to by tests/test_lag_transforms_oracle.py.
"""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mlforecast_spark.lag_transforms import (
    ExpandingMax,
    ExpandingMean,
    ExpandingMin,
    ExpandingQuantile,
    ExpandingStd,
    ExponentiallyWeightedMean,
    Lag,
    RollingMax,
    RollingMean,
    RollingMin,
    RollingQuantile,
    RollingStd,
    SeasonalRollingMean,
    SeasonalRollingStd,
)

values = st.lists(
    st.one_of(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.just(float("nan")),
    ),
    min_size=0,
    max_size=40,
)


def _frontier_series(y, lag):
    """Lagged series as seen by the appended frontier row."""
    return pd.Series(np.append(np.asarray(y, dtype="float64"), np.nan)).shift(lag)


def _check(tfm, lag, y, expected):
    got = tfm.frontier_fn(lag)(np.asarray(y, dtype="float64"))
    if expected != expected:
        assert got != got, f"{tfm} lag={lag} y={y}: got {got}, want NaN"
    else:
        assert got == got and math.isclose(got, expected, rel_tol=1e-9, abs_tol=1e-12), (
            f"{tfm} lag={lag} y={y}: got {got}, want {expected}"
        )


@given(values, st.integers(1, 3))
@settings(max_examples=200, deadline=None)
def test_lag_kernel(y, k):
    exp = _frontier_series(y, 0).shift(k).iloc[-1]
    _check(Lag(k), 1, y, exp)


@given(values, st.integers(1, 3), st.integers(1, 6), st.sampled_from([None, 1, 2]))
@settings(max_examples=200, deadline=None)
def test_rolling_kernels(y, lag, ws, ms):
    s = _frontier_series(y, lag)
    for cls, agg in [
        (RollingMean, "mean"),
        (RollingMin, "min"),
        (RollingMax, "max"),
    ]:
        tfm = cls(window_size=ws, min_samples=ms)
        mp = max(tfm._effective_min_samples(), 1)
        exp = getattr(s.rolling(ws, min_periods=mp), agg)().iloc[-1]
        _check(tfm, lag, y, exp)
    tfm = RollingStd(window_size=ws, min_samples=ms)
    mp = max(tfm._effective_min_samples(), 2)
    # a window that can never hold mp samples always yields NaN
    exp = (
        s.rolling(ws, min_periods=mp).std().iloc[-1] if mp <= ws else float("nan")
    )
    # pandas uses a different formula; the engine clamps variance at 0
    got = tfm.frontier_fn(lag)(np.asarray(y, dtype="float64"))
    if exp != exp:
        assert got != got
    else:
        # single-pass sum-of-squares (the same formula the Spark expression
        # uses) loses ~sqrt(mean^2 * eps * n) to cancellation on
        # near-constant windows; pandas' two-pass std does not — compare at
        # that noise floor, not machine precision
        assert math.isclose(got, exp, rel_tol=1e-7, abs_tol=1e-5)


@given(values, st.integers(1, 3), st.integers(1, 6), st.floats(0.0, 1.0))
@settings(max_examples=200, deadline=None)
def test_rolling_quantile_kernel(y, lag, ws, p):
    tfm = RollingQuantile(p=p, window_size=ws)
    s = _frontier_series(y, lag)
    mp = max(tfm._effective_min_samples(), 1)
    exp = s.rolling(ws, min_periods=mp).quantile(p, interpolation="linear").iloc[-1]
    _check(tfm, lag, y, exp)


@given(values, st.integers(1, 3))
@settings(max_examples=200, deadline=None)
def test_expanding_kernels(y, lag):
    s = _frontier_series(y, lag)
    for cls, agg, mp in [
        (ExpandingMean, "mean", 1),
        (ExpandingMin, "min", 1),
        (ExpandingMax, "max", 1),
        (ExpandingStd, "std", 2),
    ]:
        exp = getattr(s.expanding(min_periods=mp), agg)().iloc[-1]
        got = cls().frontier_fn(lag)(np.asarray(y, dtype="float64"))
        if exp != exp:
            assert got != got, (cls, lag, y, got)
        else:
            # std: see the cancellation note in test_rolling_kernels
            assert math.isclose(got, exp, rel_tol=1e-7, abs_tol=1e-5), (cls, lag, y)
    exp = s.expanding(min_periods=1).quantile(0.25, interpolation="linear").iloc[-1]
    _check(ExpandingQuantile(p=0.25), lag, y, exp)


@given(values, st.integers(1, 3), st.floats(0.05, 0.95))
@settings(max_examples=200, deadline=None)
def test_ewm_kernel_single_shot(y, lag, alpha):
    exp = (
        _frontier_series(y, lag)
        .ewm(alpha=alpha, adjust=False, ignore_na=True)
        .mean()
        .iloc[-1]
    )
    _check(ExponentiallyWeightedMean(alpha=alpha), lag, y, exp)


@given(values, st.floats(0.05, 0.95), st.integers(1, 2), st.integers(1, 4))
@settings(max_examples=100, deadline=None)
def test_ewm_kernel_incremental_equals_recompute(y, alpha, lag, h):
    """The stateful kernel advanced one step at a time must equal a fresh
    recompute at every horizon — the property the rollout depends on."""
    y = np.asarray(y, dtype="float64")
    tfm = ExponentiallyWeightedMean(alpha=alpha)
    stateful = tfm.frontier_fn(lag)
    hist = y.copy()
    for step in range(h):
        got = stateful(hist)
        exp = (
            pd.Series(np.append(hist, np.nan))
            .shift(lag)
            .ewm(alpha=alpha, adjust=False, ignore_na=True)
            .mean()
            .iloc[-1]
        )
        if exp != exp:
            assert got != got
        else:
            assert math.isclose(got, exp, rel_tol=1e-9, abs_tol=1e-12)
        # append a synthetic "prediction" and continue
        hist = np.append(hist, float(step) + 0.5)


@given(values, st.integers(1, 2), st.integers(2, 4), st.integers(1, 3))
@settings(max_examples=150, deadline=None)
def test_seasonal_rolling_kernel(y, lag, sl, ws):
    """Seasonal window: same-phase positions n-lag-i*sl for i in 0..ws-1."""
    tfm = SeasonalRollingMean(season_length=sl, window_size=ws, min_samples=1)
    ya = np.asarray(y, dtype="float64")
    n = len(ya)
    vals = [ya[n - lag - i * sl] for i in range(ws) if n - lag - i * sl >= 0]
    vals = [v for v in vals if v == v]
    exp = float(np.mean(vals)) if len(vals) >= 1 else float("nan")
    _check(tfm, lag, y, exp)
    tfm_std = SeasonalRollingStd(season_length=sl, window_size=ws, min_samples=2)
    if len(vals) >= 2:
        arr = np.array(vals)
        c = len(arr)
        s1, s2 = arr.sum(), (arr * arr).sum()
        exp_std = math.sqrt(max((s2 - s1 * s1 / c) / (c - 1), 0.0))
    else:
        exp_std = float("nan")
    _check(tfm_std, lag, y, exp_std)
