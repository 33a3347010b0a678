"""Differential tests vs a DuckDB window-function oracle — the Spark analogue
of the reference's SQLite oracle suite
(`/root/reference/tests/test_pooled_sqlite_oracle.py`)."""

import pytest
from pyspark.sql import functions as F

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.utils import qcol

from .conftest import assert_frames_match

MEAN = "CASE WHEN w_cnt >= {ms} AND w_cnt > 0 THEN w_sum * 1.0 / w_cnt END"
STD = (
    "CASE WHEN w_cnt >= {ms} AND w_cnt > 1 THEN"
    " SQRT(GREATEST((w_sq - w_sum * w_sum * 1.0 / w_cnt) / (w_cnt - 1), 0.0)) END"
)
AGGS = (
    "SUM(y) OVER w AS w_sum, SUM(y*y) OVER w AS w_sq, COUNT(y) OVER w AS w_cnt,"
    " MIN(y) OVER w AS w_min, MAX(y) OVER w AS w_max,"
    " quantile_cont(y, 0.5) OVER w AS w_med"
)


def _run_plan(panel, lag, tfm, extra=()):
    registry = _parse_transforms([], {lag: [tfm]})
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    name = next(iter(registry))
    feats = plan.apply(panel)
    return feats.select("unique_id", "ds", *extra, qcol(name).alias("feat"))


def _oracle(duck, pdf, window_clause, result, extra_sql=""):
    duck.register("obs", pdf)
    sql = (
        f"WITH aggs AS (SELECT unique_id, ds, {AGGS} FROM obs"
        f" WINDOW w AS ({window_clause}))"
        f" SELECT unique_id, ds, {result} AS feat FROM aggs"
    )
    out = duck.execute(sql).df()
    duck.unregister("obs")
    return out


CASES = [
    # (factory, lag, window_clause, result_expr)
    ("RollingMean", dict(window_size=7), 2,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 8 PRECEDING AND 2 PRECEDING",
     MEAN.format(ms=7)),
    ("RollingMean", dict(window_size=4, min_samples=2), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING",
     MEAN.format(ms=2)),
    ("RollingStd", dict(window_size=5), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING",
     STD.format(ms=5)),
    ("RollingMin", dict(window_size=7), 3,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 9 PRECEDING AND 3 PRECEDING",
     "CASE WHEN w_cnt >= 7 THEN w_min END"),
    ("RollingMax", dict(window_size=7), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt >= 7 THEN w_max END"),
    ("RollingQuantile", dict(p=0.5, window_size=9), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt >= 9 THEN w_med END"),
    ("ExpandingMean", dict(), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt > 0 THEN w_sum * 1.0 / w_cnt END"),
    ("ExpandingStd", dict(), 2,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING",
     "CASE WHEN w_cnt > 1 THEN SQRT(GREATEST((w_sq - w_sum * w_sum * 1.0 / w_cnt) / (w_cnt - 1), 0.0)) END"),
    ("ExpandingMin", dict(), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt > 0 THEN w_min END"),
    ("ExpandingMax", dict(), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt > 0 THEN w_max END"),
    ("ExpandingQuantile", dict(p=0.5), 1,
     "PARTITION BY unique_id ORDER BY ds ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
     "CASE WHEN w_cnt > 0 THEN w_med END"),
]


@pytest.mark.parametrize("cls,kwargs,lag,window,result", CASES, ids=[c[0] + str(i) for i, c in enumerate(CASES)])
def test_local_transform_vs_oracle(spark, panel, duck, cls, kwargs, lag, window, result):
    import mlforecast_spark.lag_transforms as lt

    tfm = getattr(lt, cls)(**kwargs)
    sdf = _run_plan(panel, lag, tfm)
    pdf = panel.toPandas()
    ddf = _oracle(duck, pdf, window, result)
    assert_frames_match(sdf, ddf)


def test_lag_vs_oracle(spark, panel, duck):
    from mlforecast_spark.lag_transforms import Lag

    sdf = _run_plan(panel, 3, Lag(3))
    duck.register("obs", panel.toPandas())
    ddf = duck.execute(
        "SELECT unique_id, ds, LAG(y, 3) OVER (PARTITION BY unique_id ORDER BY ds) AS feat FROM obs"
    ).df()
    duck.unregister("obs")
    assert_frames_match(sdf, ddf)


def test_ewm_vs_pandas(spark, panel):
    """EWM recursion vs pandas groupby-ewm (the reference's semantics)."""
    from mlforecast_spark.lag_transforms import ExponentiallyWeightedMean

    sdf = _run_plan(panel, 2, ExponentiallyWeightedMean(alpha=0.4)).toPandas()
    pdf = panel.toPandas().sort_values(["unique_id", "ds"])
    pdf["feat"] = (
        pdf.groupby("unique_id")["y"]
        .transform(lambda s: s.shift(2).ewm(alpha=0.4, adjust=False, ignore_na=True).mean())
    )
    assert_frames_match(sdf, pdf[["unique_id", "ds", "feat"]])


def test_seasonal_rolling_vs_oracle(spark, panel, duck):
    from mlforecast_spark.lag_transforms import SeasonalRollingMean

    tfm = SeasonalRollingMean(season_length=7, window_size=3, min_samples=1)
    sdf = _run_plan(panel, 1, tfm)
    duck.register("obs", panel.toPandas())
    ddf = duck.execute(
        "WITH base AS (SELECT unique_id, ds,"
        " ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS ord,"
        " LAG(y, 1) OVER (PARTITION BY unique_id ORDER BY ds) AS ly FROM obs),"
        " aggs AS (SELECT unique_id, ds, AVG(ly) OVER w AS m, COUNT(ly) OVER w AS c"
        "  FROM base WINDOW w AS (PARTITION BY unique_id, ord % 7 ORDER BY ds"
        "   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))"
        " SELECT unique_id, ds, CASE WHEN c >= 1 THEN m END AS feat FROM aggs"
    ).df()
    duck.unregister("obs")
    assert_frames_match(sdf, ddf)


def test_offset_equals_shifted_lag(spark, panel):
    """Offset(tfm, n) at lag L == tfm at lag L+n
    (`/root/reference/tests/test_lag_transforms.py:38-48` identity)."""
    from mlforecast_spark.lag_transforms import Offset, RollingMean

    a = _run_plan(panel, 1, Offset(RollingMean(window_size=5), 2)).toPandas()
    b = _run_plan(panel, 3, RollingMean(window_size=5)).toPandas()
    assert_frames_match(a, b)


def test_combine_equals_op_of_parts(spark, panel):
    """Combine == operator applied to the parts
    (`/root/reference/tests/test_lag_transforms.py:50-56` identity)."""
    import operator

    from mlforecast_spark.lag_transforms import Combine, ExpandingMean, RollingMean

    c = _run_plan(
        panel, 1, Combine(RollingMean(window_size=4), ExpandingMean(), operator.truediv)
    ).toPandas()
    p1 = _run_plan(panel, 1, RollingMean(window_size=4)).toPandas()
    p2 = _run_plan(panel, 1, ExpandingMean()).toPandas()
    merged = p1.merge(p2, on=["unique_id", "ds"], suffixes=("_a", "_b"))
    merged["feat"] = merged["feat_a"] / merged["feat_b"]
    assert_frames_match(c, merged[["unique_id", "ds", "feat"]])


def test_lookup_lag(spark, panel, duck):
    from mlforecast_spark.lag_transforms import LookupLag

    p = panel.withColumn("dow", (F.dayofweek("ds") + 5) % 7)
    sdf = _run_plan(p, 1, LookupLag(partition_by=["dow"]), extra=())
    pdf = p.toPandas()
    duck.register("obs", pdf)
    ddf = duck.execute(
        "SELECT unique_id, ds, LAG(y, 1) OVER (PARTITION BY unique_id, dow ORDER BY ds) AS feat FROM obs"
    ).df()
    duck.unregister("obs")
    assert_frames_match(sdf, ddf)


def test_feature_naming_parity():
    """Names must match the reference's deterministic naming
    (`/root/reference/mlforecast/lag_transforms.py:145-167`)."""
    import operator

    from mlforecast_spark.lag_transforms import (
        Combine,
        ExpandingMean,
        ExponentiallyWeightedMean,
        Lag,
        LookupLag,
        Offset,
        RollingMean,
        RollingQuantile,
    )

    assert Lag(7)._get_name(7) == "lag7"
    assert RollingMean(window_size=7)._get_name(1) == "rolling_mean_lag1_window_size7"
    assert (
        RollingMean(window_size=7, min_samples=2)._get_name(2)
        == "rolling_mean_lag2_window_size7_min_samples2"
    )
    assert (
        RollingQuantile(p=0.5, window_size=7)._get_name(1)
        == "rolling_quantile_lag1_p0.5_window_size7"
    )
    assert ExpandingMean()._get_name(3) == "expanding_mean_lag3"
    assert (
        ExponentiallyWeightedMean(alpha=0.3)._get_name(1)
        == "exponentially_weighted_mean_lag1_alpha0.3"
    )
    assert (
        RollingMean(window_size=7, global_=True)._get_name(1)
        == "global_rolling_mean_lag1_window_size7"
    )
    assert (
        RollingMean(window_size=7, groupby=["brand"])._get_name(1)
        == "groupby_brand_rolling_mean_lag1_window_size7"
    )
    assert (
        RollingMean(window_size=7, partition_by=["promo"])._get_name(1)
        == "partby_promo_rolling_mean_lag1_window_size7"
    )
    assert LookupLag(partition_by=["h"])._get_name(1) == "partby_h_lookup_lag1"
    assert Offset(RollingMean(window_size=7), 2)._get_name(1) == "rolling_mean_lag3_window_size7"
    name = Combine(RollingMean(window_size=7), ExpandingMean(), operator.truediv)._get_name(1)
    assert name == "rolling_mean_lag1_window_size7_truediv_expanding_mean_lag1"
