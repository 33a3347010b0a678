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
        out = out.withColumn(m, F.col(f"_mae_{m}") / F.col("_scale")).drop(f"_mae_{m}")
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
) -> DataFrame:
    """Long evaluation frame: one row per (series, metric) with a column per
    model — the utilsforecast `evaluate` shape."""
    frames = []
    for name in metrics:
        if name == "smape":
            f = smape(cv_df, models, id_col, target_col)
        elif name == "mae":
            f = mae(cv_df, models, id_col, target_col)
        elif name == "rmse":
            f = rmse(cv_df, models, id_col, target_col)
        elif name == "mase":
            if train_df is None:
                raise ValueError("mase requires train_df")
            f = mase(cv_df, train_df, models, season_length, id_col, time_col, target_col)
        else:
            raise ValueError(f"unknown metric {name!r}")
        frames.append(f.withColumn("metric", F.lit(name)))
    from functools import reduce

    return reduce(DataFrame.unionByName, frames).select(id_col, "metric", *models)
