"""Property-based differential tests (hypothesis): random panel shapes and
window parameters vs a pandas oracle. The reference has no property-based
coverage; this guards the frame arithmetic against parameter-combination
corner cases the fixed suites miss."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.utils import qcol


def _spark_feature(spark, pdf, lag, tfm):
    panel = spark.createDataFrame(pdf)
    registry = _parse_transforms([], {lag: [tfm]})
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    name = next(iter(registry))
    out = (
        plan.apply(panel)
        .select("unique_id", "ds", qcol(name).alias("feat"))
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )
    return out


def _random_panel(draw):
    n_series = draw(st.integers(1, 4))
    rows = []
    for sid in range(n_series):
        length = draw(st.integers(1, 40))
        vals = draw(
            st.lists(
                st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False, width=32),
                min_size=length,
                max_size=length,
            )
        )
        for t, v in enumerate(vals):
            rows.append((f"s{sid}", t, float(v)))
    return pd.DataFrame(rows, columns=["unique_id", "ds", "y"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_rolling_mean_property(spark, data):
    from mlforecast_spark.lag_transforms import RollingMean

    pdf = _random_panel(data.draw)
    lag = data.draw(st.integers(1, 5))
    ws = data.draw(st.integers(1, 10))
    ms = data.draw(st.one_of(st.none(), st.integers(1, 10)))
    got = _spark_feature(spark, pdf, lag, RollingMean(window_size=ws, min_samples=ms))

    eff_ms = min(ms if ms is not None else ws, ws)
    exp_rows = []
    for uid, g in pdf.groupby("unique_id"):
        y = g.sort_values("ds")["y"].to_numpy()
        for i in range(len(y)):
            lo, hi = i - lag - ws + 1, i - lag  # inclusive window positions
            window = y[max(lo, 0) : hi + 1] if hi >= 0 else np.array([])
            exp_rows.append(
                window.mean() if len(window) >= max(eff_ms, 1) else np.nan
            )
    exp = np.array(exp_rows)
    gv = got["feat"].to_numpy(dtype="float64")
    ok = np.isclose(gv, exp, rtol=1e-9, equal_nan=True) | (
        np.isnan(gv) & np.isnan(exp)
    )
    assert ok.all(), f"lag={lag} ws={ws} ms={ms}: {np.where(~ok)[0][:5]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_expanding_mean_property(spark, data):
    from mlforecast_spark.lag_transforms import ExpandingMean

    pdf = _random_panel(data.draw)
    lag = data.draw(st.integers(1, 5))
    got = _spark_feature(spark, pdf, lag, ExpandingMean())
    exp_rows = []
    for uid, g in pdf.groupby("unique_id"):
        y = g.sort_values("ds")["y"].to_numpy()
        for i in range(len(y)):
            window = y[: i - lag + 1] if i - lag >= 0 else np.array([])
            exp_rows.append(window.mean() if len(window) else np.nan)
    exp = np.array(exp_rows)
    gv = got["feat"].to_numpy(dtype="float64")
    ok = np.isclose(gv, exp, rtol=1e-9, equal_nan=True) | (np.isnan(gv) & np.isnan(exp))
    assert ok.all()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_lag_property(spark, data):
    from mlforecast_spark.lag_transforms import Lag

    pdf = _random_panel(data.draw)
    lag = data.draw(st.integers(1, 8))
    got = _spark_feature(spark, pdf, lag, Lag(lag))
    exp = (
        pdf.sort_values(["unique_id", "ds"])
        .groupby("unique_id")["y"]
        .shift(lag)
        .to_numpy()
    )
    gv = got["feat"].to_numpy(dtype="float64")
    ok = np.isclose(gv, exp, rtol=1e-12, equal_nan=True) | (np.isnan(gv) & np.isnan(exp))
    assert ok.all()
