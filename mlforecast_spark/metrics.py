"""Forecast evaluation metrics as Spark aggregate expressions.

The reference evaluates with utilsforecast's smape/mase/... on pandas frames
(`/root/reference/tests/test_m4.py:140-168`); here the same metrics are one
aggregation over the (id, ds, y, *models) backtest frame — no collect until
the final tiny per-series or scalar result.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _per_series_agg(df, id_col, exprs):
    return df.groupBy(id_col).agg(*exprs)


def smape(cv_df: DataFrame, models: Sequence[str], id_col="unique_id", target_col="y") -> DataFrame:
    """Per-series symmetric MAPE in [0, 2] (×100 for the M4 convention)."""
    exprs = []
    y = F.col(target_col)
    for m in models:
        p = F.col(f"`{m}`")
        denom = F.abs(y) + F.abs(p)
        exprs.append(
            F.avg(F.when(denom > 0, 2.0 * F.abs(p - y) / denom).otherwise(0.0)).alias(m)
        )
    return _per_series_agg(cv_df, id_col, exprs)


def mae(cv_df: DataFrame, models: Sequence[str], id_col="unique_id", target_col="y") -> DataFrame:
    y = F.col(target_col)
    return _per_series_agg(
        cv_df, id_col, [F.avg(F.abs(F.col(f"`{m}`") - y)).alias(m) for m in models]
    )


def rmse(cv_df: DataFrame, models: Sequence[str], id_col="unique_id", target_col="y") -> DataFrame:
    y = F.col(target_col)
    return _per_series_agg(
        cv_df,
        id_col,
        [F.sqrt(F.avg(F.pow(F.col(f"`{m}`") - y, 2))).alias(m) for m in models],
    )


def mape(cv_df: DataFrame, models: Sequence[str], id_col="unique_id", target_col="y") -> DataFrame:
    """Per-series MAPE. Zero-target rows are EXCLUDED from the mean
    (``try_divide`` yields NULL there and ``avg`` skips NULLs — the
    distributed analog of dropping the undefined terms; numpy propagates
    inf instead). ANSI-safe on Spark 4's default mode."""
    y = F.col(target_col)
    return _per_series_agg(
        cv_df,
        id_col,
        [
            F.avg(F.try_divide(F.abs(F.col(f"`{m}`") - y), F.abs(y))).alias(m)
            for m in models
        ],
    )


def rmsse(
    cv_df: DataFrame,
    train_df: DataFrame,
    models: Sequence[str],
    season_length: int = 1,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
) -> DataFrame:
    """Per-series RMSSE (the M5 metric): sqrt(MSE of the forecast / MSE of
    the in-sample seasonal-naive forecast) — :func:`mase` with both terms
    squared."""
    w = Window.partitionBy(id_col).orderBy(time_col)
    scale = (
        train_df.withColumn("_naive", F.lag(target_col, season_length).over(w))
        .filter(F.col("_naive").isNotNull())
        .groupBy(id_col)
        .agg(F.avg(F.pow(F.col(target_col) - F.col("_naive"), 2)).alias("_scale"))
    )
    y = F.col(target_col)
    per_series = _per_series_agg(
        cv_df,
        id_col,
        [F.avg(F.pow(F.col(f"`{m}`") - y, 2)).alias(f"_mse_{m}") for m in models],
    )
    out = per_series.join(scale, on=id_col, how="left")
    for m in models:
        out = out.withColumn(m, F.sqrt(F.try_divide(F.col(f"_mse_{m}"), F.col("_scale")))).drop(
            f"_mse_{m}"
        )
    return out.drop("_scale")


def quantile_loss(
    cv_df: DataFrame,
    models: Sequence[str],
    q: float = 0.5,
    id_col: str = "unique_id",
    target_col: str = "y",
) -> DataFrame:
    """Per-series pinball loss at quantile ``q``: mean of
    ``max(q*(y-p), (q-1)*(y-p))``. Pass the quantile forecast's column
    names as ``models`` (e.g. ``LinearRegression-lo-90``)."""
    y = F.col(target_col)
    exprs = []
    for m in models:
        d = y - F.col(f"`{m}`")
        exprs.append(F.avg(F.greatest(q * d, (q - 1.0) * d)).alias(m))
    return _per_series_agg(cv_df, id_col, exprs)


def mqloss(
    cv_df: DataFrame,
    models: Sequence[str],
    level: Sequence[int],
    id_col: str = "unique_id",
    target_col: str = "y",
) -> DataFrame:
    """Per-series multi-quantile loss over the conformal interval columns:
    for each confidence ``lv`` in ``level``, ``{model}-lo-{lv}`` is scored
    as the (1-lv/100)/2 quantile and ``{model}-hi-{lv}`` as its mirror; the
    result is the mean pinball loss across all 2*len(level) quantiles —
    the utilsforecast ``mqloss`` contract on this engine's interval naming
    (:mod:`mlforecast_spark.conformal`)."""
    y = F.col(target_col)
    exprs = []
    for m in models:
        terms = []
        for lv in level:
            alpha = (1.0 - lv / 100.0) / 2.0
            for side, qv in ((f"{m}-lo-{lv}", alpha), (f"{m}-hi-{lv}", 1.0 - alpha)):
                d = y - F.col(f"`{side}`")
                terms.append(F.greatest(qv * d, (qv - 1.0) * d))
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        exprs.append(F.avg(total / float(len(terms))).alias(m))
    return _per_series_agg(cv_df, id_col, exprs)


def coverage(
    cv_df: DataFrame,
    models: Sequence[str],
    level: int,
    id_col: str = "unique_id",
    target_col: str = "y",
) -> DataFrame:
    """Per-series empirical coverage of the ``{model}-lo-{level}`` /
    ``{model}-hi-{level}`` interval: the fraction of actuals inside it
    (calibrated conformal intervals should read ~level/100)."""
    y = F.col(target_col)
    return _per_series_agg(
        cv_df,
        id_col,
        [
            F.avg(
                (
                    (y >= F.col(f"`{m}-lo-{level}`"))
                    & (y <= F.col(f"`{m}-hi-{level}`"))
                ).cast("double")
            ).alias(m)
            for m in models
        ],
    )


def mase(
    cv_df: DataFrame,
    train_df: DataFrame,
    models: Sequence[str],
    season_length: int = 1,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
) -> DataFrame:
    """Per-series MASE: MAE of the forecast over the MAE of the in-sample
    seasonal-naive forecast."""
    w = Window.partitionBy(id_col).orderBy(time_col)
    scale = (
        train_df.withColumn("_naive", F.lag(target_col, season_length).over(w))
        .filter(F.col("_naive").isNotNull())
        .groupBy(id_col)
        .agg(F.avg(F.abs(F.col(target_col) - F.col("_naive"))).alias("_scale"))
    )
    y = F.col(target_col)
    per_series = _per_series_agg(
        cv_df, id_col, [F.avg(F.abs(F.col(f"`{m}`") - y)).alias(f"_mae_{m}") for m in models]
    )
    out = per_series.join(scale, on=id_col, how="left")
    for m in models:
        out = out.withColumn(m, F.try_divide(F.col(f"_mae_{m}"), F.col("_scale"))).drop(f"_mae_{m}")
    return out.drop("_scale")


def evaluate(
    cv_df: DataFrame,
    metrics: Sequence[str],
    models: Sequence[str],
    train_df: Optional[DataFrame] = None,
    season_length: int = 1,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    level: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Long evaluation frame: one row per (series, metric) with a column per
    model — the utilsforecast `evaluate` shape. ``mqloss``/``coverage``
    need ``level`` and score the conformal ``{model}-lo/hi-{lv}`` columns
    present in ``cv_df``."""
    frames = []
    for name in metrics:
        if name == "coverage" and level and len(level) > 1:
            # one row per level, metric named 'coverage-{lv}' — mirrors the
            # utilsforecast evaluate(level=[...]) pattern so coverage can mix
            # with mqloss in one call instead of raising on multiple levels
            for lv in level:
                frames.append(
                    coverage(cv_df, models, lv, id_col, target_col).withColumn(
                        "metric", F.lit(f"coverage-{lv}")
                    )
                )
            continue
        if name == "smape":
            f = smape(cv_df, models, id_col, target_col)
        elif name == "mae":
            f = mae(cv_df, models, id_col, target_col)
        elif name == "rmse":
            f = rmse(cv_df, models, id_col, target_col)
        elif name == "mape":
            f = mape(cv_df, models, id_col, target_col)
        elif name == "mase":
            if train_df is None:
                raise ValueError("mase requires train_df")
            f = mase(cv_df, train_df, models, season_length, id_col, time_col, target_col)
        elif name == "rmsse":
            if train_df is None:
                raise ValueError("rmsse requires train_df")
            f = rmsse(cv_df, train_df, models, season_length, id_col, time_col, target_col)
        elif name == "mqloss":
            if not level:
                raise ValueError("mqloss requires level")
            f = mqloss(cv_df, models, level, id_col, target_col)
        elif name == "coverage":
            if not level or len(level) != 1:
                raise ValueError("coverage requires exactly one level")
            f = coverage(cv_df, models, level[0], id_col, target_col)
        else:
            raise ValueError(f"unknown metric {name!r}")
        frames.append(f.withColumn("metric", F.lit(name)))
    from functools import reduce

    return reduce(DataFrame.unionByName, frames).select(id_col, "metric", *models)
