"""The sql_expr() plan-build fast path must compile to the exact same
results as the Column expr() path it shadows (`lag_transforms.py`,
`core.py:FrameCtx`). This pins the equivalence transform-by-transform by
running one FeaturePlan through both paths — the SQL path as shipped, the
Column path by stripping sql_expr back to the base-class None."""

import operator

import pytest
from pyspark.sql import functions as F

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.lag_transforms import (
    Combine,
    ExpandingMax,
    ExpandingMean,
    ExpandingQuantile,
    ExpandingStd,
    Lag,
    LookupLag,
    Offset,
    RollingMax,
    RollingMean,
    RollingMin,
    RollingQuantile,
    RollingStd,
    SeasonalRollingMean,
    SeasonalRollingQuantile,
    SeasonalRollingStd,
    _BaseLagTransform,
)

LAGS = [1, 3]
LAG_TFMS = {
    1: [
        RollingMean(window_size=4),
        RollingMean(window_size=4, min_samples=1),
        RollingStd(window_size=5),
        RollingMin(window_size=3),
        RollingMax(window_size=3),
        RollingQuantile(p=0.25, window_size=6),
        ExpandingMean(),
        ExpandingStd(),
        ExpandingMax(),
        ExpandingQuantile(p=0.75),
        SeasonalRollingMean(season_length=7, window_size=2),
        SeasonalRollingStd(season_length=7, window_size=3, min_samples=2),
        SeasonalRollingQuantile(p=0.5, season_length=7, window_size=2),
        Offset(RollingMean(window_size=3), 2),
        Combine(RollingMean(window_size=3), Lag(2), operator.truediv),
        Combine(ExpandingMean(), RollingMean(window_size=4), operator.sub),
    ],
    2: [LookupLag(partition_by=["flag"])],
}


def _plan():
    registry = _parse_transforms(LAGS, LAG_TFMS)
    return FeaturePlan(schema=PanelSchema(), registry=registry)


def _panel(spark):
    from mlforecast_spark.utils import generate_daily_series

    df = generate_daily_series(spark, n_series=5, min_length=30, max_length=60)
    # nulls in y + an extra partition column for LookupLag
    return df.select(
        "unique_id",
        "ds",
        F.when(F.dayofmonth("ds") % 11 == 0, None).otherwise(F.col("y")).alias("y"),
        (F.dayofmonth("ds") % 2).alias("flag"),
    )


def test_sql_path_is_used_and_matches_column_path(spark, monkeypatch):
    panel = _panel(spark)
    plan = _plan()

    # the shipped path: every transform above must emit SQL (no silent
    # fallback hiding a missing implementation)
    from mlforecast_spark.core import FrameCtx
    from mlforecast_spark.utils import qsql

    ctx = FrameCtx(
        y=F.col("y"), id_col="unique_id", time_col="ds",
        partition_cols=("unique_id",), y_name=qsql("y"),
    )
    for name, (lag, tfm) in plan.registry.items():
        assert tfm.sql_expr(ctx, lag) is not None, name

    sql_out = plan.apply(panel).toPandas()

    # strip the fast path -> pure Column construction
    monkeypatch.setattr(_BaseLagTransform, "sql_expr", lambda self, ctx, lag: None)
    col_out = _plan().apply(panel).toPandas()

    key = ["unique_id", "ds"]
    sql_out = sql_out.sort_values(key).reset_index(drop=True)
    col_out = col_out.sort_values(key).reset_index(drop=True)
    assert list(sql_out.columns) == list(col_out.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(sql_out, col_out, check_exact=True)


def test_sql_path_declines_pooled_and_range_ctx():
    """Pooled/range contexts (no y_name) must keep the Column path."""
    from mlforecast_spark.core import FrameCtx

    ctx = FrameCtx(
        y=F.col("_psum"), id_col="unique_id", time_col="ds",
        use_range=True, order_col="_ord", partition_cols=("b",),
    )
    for tfm, lag in [
        (RollingMean(window_size=3), 1),
        (ExpandingStd(), 2),
        (SeasonalRollingMean(season_length=7, window_size=2), 1),
        (Lag(3), 1),
    ]:
        assert tfm.sql_expr(ctx, lag) is None


def test_offset_sql_rejects_nonpositive_effective_lag():
    from mlforecast_spark.core import FrameCtx
    from mlforecast_spark.utils import qsql

    ctx = FrameCtx(
        y=F.col("y"), id_col="unique_id", time_col="ds",
        partition_cols=("unique_id",), y_name=qsql("y"),
    )
    with pytest.raises(ValueError, match="effective"):
        Offset(RollingMean(window_size=3), -2).sql_expr(ctx, 1)


def test_mixed_python_jvm_combine_matches_pandas(spark):
    """Combine with one python-path side (EWM pandas engine) and one JVM
    window side must resolve and match an independent pandas replay. The
    hidden side columns inherit reference-parity names containing dots
    (alpha0.5), which `_finish_combines` must reference through qcol —
    plain F.col parsed the dot as a struct accessor and the whole mixed
    path raised AnalysisException (latent until r11 surfaced it; the
    python-first pass reorder now also routes these through one shared
    finish step after both passes)."""
    import pandas as pd

    from mlforecast_spark.lag_transforms import ExponentiallyWeightedMean

    pdf = pd.DataFrame(
        {
            "unique_id": ["a"] * 30 + ["b"] * 20,
            "ds": list(pd.date_range("2020-01-01", periods=30))
            + list(pd.date_range("2020-02-01", periods=20)),
            "y": [float(i + 1) for i in range(30)]
            + [float(2 * i + 3) for i in range(20)],
        }
    )
    df = spark.createDataFrame(pdf)
    registry = _parse_transforms(
        [1],
        {
            1: [
                Combine(
                    ExponentiallyWeightedMean(alpha=0.5),
                    RollingMean(window_size=7, min_samples=1),
                    operator.truediv,
                )
            ]
        },
    )
    out = FeaturePlan(schema=PanelSchema(), registry=registry).apply(df)
    name = next(k for k in registry if "truediv" in k)
    assert name in out.columns
    assert not any(c.startswith("_mlfs_c") for c in out.columns)
    got = {
        (r["unique_id"], r["ds"]): r[name]
        for r in out.collect()
    }
    for uid, g in pdf.groupby("unique_id"):
        s = g["y"].shift(1)
        exp = (
            s.ewm(alpha=0.5, adjust=False, ignore_na=True).mean()
            / s.rolling(7, min_periods=1).mean()
        )
        for ds, e in zip(g["ds"], exp):
            a = got[(uid, ds)]
            if pd.isna(e):
                assert a is None, (uid, ds, a)
            else:
                assert a is not None and abs(a - e) < 1e-12, (uid, ds, a, e)
