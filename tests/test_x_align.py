"""predict(x_align='asof'): irregular dynamic-exog alignment through the
distributed as-of join.

The reference only supports gap-free exogenous grids — its alignment is a
plain time-offset equi join (`/root/reference/mlforecast/core.py:1124-1170`)
that silently drops any feed row whose timestamp misses a grid step. These
tests pin (a) that the equi path really does drop such rows (nulls reach the
model), and (b) that x_align='asof' recovers exactly the forward-filled
frame a user would have built by hand."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.lag_transforms import Lag
from mlforecast_spark.models import LinearRegression


@pytest.fixture(scope="module")
def exog_panel(spark):
    """2 series × 30 daily steps with a dynamic `price` column the model
    genuinely uses (y correlates with price)."""
    rows = []
    for uid, base in [("a", 10.0), ("b", 50.0)]:
        price = 1.0
        for t in range(30):
            if t % 5 == 0:
                price += 0.5
            rows.append((uid, f"2024-01-{t + 1:02d}", base + 3.0 * price + 0.1 * t, price))
    df = spark.createDataFrame(rows, "unique_id string, ds string, y double, price double")
    return df.withColumn("ds", F.to_date("ds"))


def _fit(panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    return mf


@pytest.fixture(scope="module")
def sparse_future(spark):
    """An IRREGULAR feed: per series, the last known print (2024-01-28,
    BEFORE the forecast window — the equi join drops it entirely) plus one
    mid-window print (2024-02-02, not the first grid step). The as-of
    carries the old print into steps before 02-02 and the new one after."""
    rows = [
        ("a", "2024-01-28", 5.0), ("b", "2024-01-28", 5.0),
        ("a", "2024-02-02", 9.0), ("b", "2024-02-02", 9.0),
    ]
    df = spark.createDataFrame(rows, "unique_id string, ds string, price double")
    return df.withColumn("ds", F.to_date("ds"))


def test_exact_align_drops_offgrid_rows(spark, exog_panel, sparse_future):
    """Default equi alignment: grid steps without an exact feed timestamp
    get NULL price — the silent-drop failure mode the asof mode fixes."""
    mf = _fit(exog_panel)
    aligned = mf._align_exog_asof(sparse_future, 5, mf.statics_)
    exact = mf.make_future_dataframe(5).join(
        sparse_future, on=["unique_id", "ds"], how="left"
    )
    n_null_exact = exact.filter(F.col("price").isNull()).count()
    n_null_asof = aligned.filter(F.col("price").isNull()).count()
    assert n_null_exact == 8  # 4 of 5 steps per series miss the prints
    assert n_null_asof == 0  # asof carries both prints across the grid


def test_asof_align_equals_handfilled_exact(spark, exog_panel, sparse_future):
    """x_align='asof' predictions == x_align='exact' fed the manually
    forward-filled dense grid (the frame a careful user builds by hand)."""
    mf = _fit(exog_panel)
    got = mf.predict(5, X_df=sparse_future, x_align="asof").toPandas()

    dense = mf.make_future_dataframe(5).toPandas()
    sf = sparse_future.toPandas()
    filled = []
    for _, row in dense.iterrows():
        prints = sf[(sf.unique_id == row.unique_id) & (sf.ds <= row.ds)]
        filled.append((row.unique_id, row.ds, float(prints.price.iloc[-1])))
    hand = spark.createDataFrame(
        pd.DataFrame(filled, columns=["unique_id", "ds", "price"])
    )
    exp = mf.predict(5, X_df=hand, x_align="exact").toPandas()
    key = ["unique_id", "ds"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_x_align_validation(spark, exog_panel, sparse_future):
    mf = _fit(exog_panel)
    with pytest.raises(ValueError, match="x_align"):
        mf.predict(5, X_df=sparse_future, x_align="nearest")


def test_asof_align_works_in_direct_and_cogroup_engines(spark, exog_panel, sparse_future):
    """The alignment happens BEFORE engine dispatch, so direct mode and the
    cogrouped rollout see the same exact-grid X_df; loop == cogroup."""
    mf_direct = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf_direct.fit(exog_panel, max_horizon=3)
    d = mf_direct.predict(3, X_df=sparse_future, x_align="asof")
    assert d.count() == 6
    assert d.filter(F.col("LinearRegression").isNull()).count() == 0

    mf = _fit(exog_panel)
    loop = mf.predict(3, X_df=sparse_future, x_align="asof", engine="spark").toPandas()
    cg = mf.predict(3, X_df=sparse_future, x_align="asof", engine="cogroup").toPandas()
    key = ["unique_id", "ds"]
    pd.testing.assert_frame_equal(
        loop.sort_values(key).reset_index(drop=True),
        cg.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
