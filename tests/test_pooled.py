"""Pooled-mode differential tests vs DuckDB (the reference's most distinctive
semantics; SQL templates mirror `/root/reference/tests/test_pooled_sqlite_oracle.py:115-213`)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.utils import qcol

from .conftest import assert_frames_match


@pytest.fixture(scope="module")
def global_panel(spark):
    """FIXTURES.md F3: 2 aligned series × 8 integer timestamps."""
    rows = [("a", i, float(1 + 2 * i)) for i in range(8)] + [
        ("b", i, float(2 + 2 * i)) for i in range(8)
    ]
    return spark.createDataFrame(rows, "unique_id string, ds long, y double")


@pytest.fixture(scope="module")
def groupby_panel(spark):
    """FIXTURES.md F4: 4 series × 8 ts, static brand (2 series each)."""
    rows = []
    for i, (uid, brand) in enumerate([("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Y")]):
        for t in range(8):
            rows.append((uid, brand, t, float((i + 1) * 10 + t)))
    return spark.createDataFrame(rows, "unique_id string, brand string, ds long, y double")


@pytest.fixture(scope="module")
def partition_panel(spark):
    """FIXTURES.md F5: dynamic promo col with parent-calendar holes."""
    rows = []
    for uid in ["a", "b"]:
        for t in range(10):
            promo = "on" if (t % 3 == 0) else ("off" if t % 3 == 1 else None)
            rows.append((uid, t, float(t + (1 if uid == "a" else 100)), promo))
    return spark.createDataFrame(rows, "unique_id string, ds long, y double, promo string")


def _run(panel, lag, tfm):
    registry = _parse_transforms([], {lag: [tfm]})
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    name = next(iter(registry))
    return plan.apply(panel).select("unique_id", "ds", qcol(name).alias("feat"))


def _oracle(duck, pdf, sql):
    duck.register("obs", pdf)
    out = duck.execute(sql).df()
    duck.unregister("obs")
    return out


def test_global_rolling_mean(spark, global_panel, duck):
    from mlforecast_spark.lag_transforms import RollingMean

    sdf = _run(global_panel, 1, RollingMean(window_size=3, global_=True))
    # pooled samples are rows; min_samples counts rows across series
    ddf = _oracle(
        duck,
        global_panel.toPandas(),
        "WITH base AS (SELECT unique_id, ds, y, DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM obs),"
        " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM base"
        "  WINDOW w AS (ORDER BY ord RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, CASE WHEN c >= 3 THEN s * 1.0 / c END AS feat FROM aggs",
    )
    assert_frames_match(sdf, ddf)


def test_global_time_agg_sum(spark, global_panel, duck):
    from mlforecast_spark.lag_transforms import RollingMean

    sdf = _run(global_panel, 1, RollingMean(window_size=3, global_=True, time_agg="sum"))
    ddf = _oracle(
        duck,
        global_panel.toPandas(),
        "WITH base AS (SELECT unique_id, ds, y, DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM obs),"
        " collapsed AS (SELECT ord, SUM(y) AS y FROM base GROUP BY ord),"
        " aggs AS (SELECT ord, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM collapsed"
        "  WINDOW w AS (ORDER BY ord RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING))"
        " SELECT b.unique_id, b.ds, CASE WHEN a.c >= 3 THEN a.s * 1.0 / a.c END AS feat"
        " FROM base b LEFT JOIN aggs a ON b.ord = a.ord",
    )
    assert_frames_match(sdf, ddf)


@pytest.mark.parametrize("time_agg,fn", [(None, None), ("sum", "SUM"), ("mean", "AVG"), ("max", "MAX")])
def test_groupby_rolling_mean(spark, groupby_panel, duck, time_agg, fn):
    from mlforecast_spark.lag_transforms import RollingMean

    tfm = RollingMean(window_size=4, min_samples=2, groupby=["brand"], time_agg=time_agg)
    sdf = _run(groupby_panel, 1, tfm)
    if time_agg is None:
        sql = (
            "WITH base AS (SELECT unique_id, ds, y,"
            " DENSE_RANK() OVER (PARTITION BY brand ORDER BY ds) - 1 AS ord, brand FROM obs),"
            " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM base"
            "  WINDOW w AS (PARTITION BY brand ORDER BY ord RANGE BETWEEN 4 PRECEDING AND 1 PRECEDING))"
            " SELECT unique_id, ds, CASE WHEN c >= 2 THEN s * 1.0 / c END AS feat FROM aggs"
        )
    else:
        sql = (
            "WITH base AS (SELECT unique_id, ds, y,"
            " DENSE_RANK() OVER (PARTITION BY brand ORDER BY ds) - 1 AS ord, brand FROM obs),"
            f" collapsed AS (SELECT brand, ord, {fn}(y) AS y FROM base GROUP BY brand, ord),"
            " aggs AS (SELECT brand, ord, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM collapsed"
            "  WINDOW w AS (PARTITION BY brand ORDER BY ord RANGE BETWEEN 4 PRECEDING AND 1 PRECEDING))"
            " SELECT b.unique_id, b.ds, CASE WHEN a.c >= 2 THEN a.s * 1.0 / a.c END AS feat"
            " FROM base b LEFT JOIN aggs a ON b.brand = a.brand AND b.ord = a.ord"
        )
    ddf = _oracle(duck, groupby_panel.toPandas(), sql)
    assert_frames_match(sdf, ddf)


@pytest.mark.parametrize("time_agg", [None, "sum"])
def test_global_partition_by(spark, partition_panel, duck, time_agg):
    """global_ + partition_by: parent calendar is GLOBAL (all series), buckets
    come from the dynamic column (`/root/reference/mlforecast/pooled.py:427-460`
    scoping matrix). Regression test for the round-7 `_collapsed_ord`
    ambiguous-self-join crash on the agg/time_agg fast path (ADVICE r7)."""
    from mlforecast_spark.lag_transforms import RollingMean

    sdf = _run(
        partition_panel,
        1,
        RollingMean(
            window_size=3, min_samples=1, global_=True, partition_by=["promo"],
            time_agg=time_agg,
        ),
    )
    if time_agg is None:
        sql = (
            "WITH base AS (SELECT unique_id, ds, y, promo,"
            " DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM obs),"
            " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM base"
            "  WINDOW w AS (PARTITION BY promo ORDER BY ord"
            "   RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING))"
            " SELECT unique_id, ds, CASE WHEN c >= 1 THEN s * 1.0 / c END AS feat FROM aggs"
        )
    else:
        sql = (
            "WITH base AS (SELECT unique_id, ds, y, promo,"
            " DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM obs),"
            " collapsed AS (SELECT promo, ord, SUM(y) AS y FROM base GROUP BY promo, ord),"
            " aggs AS (SELECT promo, ord, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM collapsed"
            "  WINDOW w AS (PARTITION BY promo ORDER BY ord"
            "   RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING))"
            " SELECT b.unique_id, b.ds, CASE WHEN a.c >= 1 THEN a.s * 1.0 / a.c END AS feat"
            " FROM base b LEFT JOIN aggs a"
            " ON b.promo IS NOT DISTINCT FROM a.promo AND b.ord = a.ord"
        )
    ddf = _oracle(duck, partition_panel.toPandas(), sql)
    assert_frames_match(sdf, ddf)


def test_partition_by_with_null_bucket(spark, partition_panel, duck):
    """Null partition values form one bucket; ordinals keep parent-calendar
    holes (`/root/reference/mlforecast/pooled.py:427-460`)."""
    from mlforecast_spark.lag_transforms import RollingMean

    sdf = _run(partition_panel, 1, RollingMean(window_size=4, partition_by=["promo"]))
    ddf = _oracle(
        duck,
        partition_panel.toPandas(),
        "WITH base AS (SELECT unique_id, ds, y, promo,"
        " DENSE_RANK() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS ord FROM obs),"
        " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM base"
        "  WINDOW w AS (PARTITION BY unique_id, promo ORDER BY ord"
        "   RANGE BETWEEN 4 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, CASE WHEN c >= 1 THEN s * 1.0 / c END AS feat FROM aggs",
    )
    assert_frames_match(sdf, ddf)


def test_nan_null_bucket_unification(spark):
    """NaN and NULL partition keys land in the same bucket
    (`/root/reference/mlforecast/pooled.py:21-66`)."""
    from mlforecast_spark.lag_transforms import ExpandingMean

    rows = [
        ("a", 0, 1.0, float("nan")),
        ("a", 1, 2.0, None),
        ("a", 2, 3.0, float("nan")),
        ("a", 3, 4.0, None),
    ]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double, k double")
    sdf = _run(panel, 1, ExpandingMean(partition_by=["k"])).toPandas()
    sdf = sdf.sort_values("ds").reset_index(drop=True)
    # if NaN/None were separate buckets the expanding means would restart
    assert sdf["feat"].tolist()[1:] == [1.0, 1.5, 2.0]


def test_nan_null_groupby_parent_unification(spark):
    """NaN and NULL GROUPBY keys land in one bucket AND one parent calendar
    (the collapsed-frame ordinal path must rank them as a single scope —
    `/root/reference/mlforecast/pooled.py:21-66` missing-is-one-bucket
    semantics, round-7 `core._collapsed_ord`)."""
    from mlforecast_spark.lag_transforms import ExpandingMean

    rows = [
        ("a", 0, 1.0, float("nan")),
        ("a", 1, 2.0, float("nan")),
        ("b", 0, 3.0, None),
        ("b", 1, 4.0, None),
    ]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double, k double")
    sdf = _run(panel, 1, ExpandingMean(groupby=["k"])).toPandas()
    sdf = sdf.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    # one pooled scope: at ds=1 the expanding mean (lag 1) covers BOTH series'
    # ds=0 values (1+3)/2; if NaN/None split calendars it would be per-series
    vals = {(r.unique_id, r.ds): r.feat for r in sdf.itertuples()}
    assert vals[("a", 1)] == 2.0 and vals[("b", 1)] == 2.0


def test_pooled_ewm_groupby(spark, groupby_panel):
    """Pooled EWM: recursion over per-(brand, ts) means
    (`/root/reference/mlforecast/lag_transforms.py:1607-1640`)."""
    from mlforecast_spark.lag_transforms import ExponentiallyWeightedMean

    sdf = _run(
        groupby_panel, 1, ExponentiallyWeightedMean(alpha=0.5, groupby=["brand"])
    ).toPandas()
    pdf = groupby_panel.toPandas()
    means = pdf.groupby(["brand", "ds"])["y"].mean().reset_index()

    def expected(brand, ds):
        vals = means[(means.brand == brand) & (means.ds <= ds - 1)].sort_values("ds")["y"]
        e = None
        for v in vals:
            e = v if e is None else 0.5 * v + 0.5 * e
        return e

    pdf = pdf.merge(sdf, on=["unique_id", "ds"])
    for _, r in pdf.iterrows():
        exp = expected(r["brand"], r["ds"])
        if exp is None:
            assert pd.isna(r["feat"])
        else:
            assert abs(r["feat"] - exp) < 1e-9, (r["unique_id"], r["ds"], r["feat"], exp)
