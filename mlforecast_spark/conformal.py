"""Conformal prediction intervals.

Reference semantics: `/root/reference/mlforecast/conformal_prediction.py`
(`PredictionIntervals` config `:14-50`; distribution intervals `:247-297`;
error intervals `:298-341`; score computation driver
`/root/reference/mlforecast/forecast.py:682-760`).

Spark strategy: conformity scores live in a small per-(series, step) frame
from a refit=False backtest. Interval columns are exact ``percentile``
aggregates grouped by (series, step) — for ``conformal_distribution`` the
identity quantile(pred ± s) = pred + quantile(±s) (pred constant within the
group) turns the reference's path construction into one groupBy + join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class PredictionIntervals:
    """Config (`/root/reference/mlforecast/conformal_prediction.py:14-50`)."""

    def __init__(self, n_windows: int = 2, h: int = 1, method: str = "conformal_distribution"):
        if n_windows < 2:
            raise ValueError("You need at least two windows to compute conformal intervals")
        if method not in ("conformal_distribution", "conformal_error"):
            raise ValueError(
                "method must be 'conformal_distribution' or 'conformal_error'"
            )
        self.n_windows = n_windows
        self.h = h
        self.method = method

    def __repr__(self):
        return (
            f"PredictionIntervals(n_windows={self.n_windows}, h={self.h}, "
            f"method='{self.method}')"
        )


def conformity_scores(
    cv_df: DataFrame,
    model_names: Sequence[str],
    id_col: str,
    time_col: str,
    target_col: str,
    method: str,
) -> DataFrame:
    """(id, step, score per model) from a backtest frame.

    conformal_distribution keeps signed errors; conformal_error stores |error|
    (`/root/reference/mlforecast/conformal_prediction.py:758-789`)."""
    w = Window.partitionBy(id_col, "cutoff").orderBy(time_col)
    out = cv_df.withColumn("_step", F.row_number().over(w))
    exprs = []
    for m in model_names:
        err = F.col(target_col) - F.col(m)
        if method == "conformal_error":
            err = F.abs(err)
        exprs.append(err.alias(m))
    return out.select(id_col, "_step", *exprs)


def add_interval_columns(
    preds: DataFrame,
    cs_df: DataFrame,
    model_names: Sequence[str],
    level: Sequence[float],
    method: str,
    id_col: str,
    time_col: str,
) -> DataFrame:
    """Attach `{model}-lo-{lv}` / `{model}-hi-{lv}` columns."""
    level = sorted(level)
    w = Window.partitionBy(id_col).orderBy(time_col)
    preds = preds.withColumn("_step", F.row_number().over(w))

    if method == "conformal_distribution":
        # symmetric score paths: quantiles of {-s, +s} per (id, step)
        alphas = [100 - lv for lv in level]
        cuts = [a / 200 for a in reversed(alphas)] + [1 - a / 200 for a in alphas]
        cut_names = [f"lo-{lv}" for lv in reversed(level)] + [f"hi-{lv}" for lv in level]
        sym = cs_df.select(
            id_col, "_step", *[F.col(m).alias(m) for m in model_names]
        ).unionByName(
            cs_df.select(
                id_col, "_step", *[(-F.col(m)).alias(m) for m in model_names]
            )
        )
        aggs = []
        for m in model_names:
            for cut, cn in zip(cuts, cut_names):
                aggs.append(F.percentile(F.col(m), F.lit(cut)).alias(f"_q_{m}_{cn}"))
        qs = sym.groupBy(id_col, "_step").agg(*aggs)
        out = preds.join(qs, on=[id_col, "_step"], how="left")
        for m in model_names:
            for cn in cut_names:
                out = out.withColumn(
                    f"{m}-{cn}", F.col(m) + F.col(f"_q_{m}_{cn}")
                ).drop(f"_q_{m}_{cn}")
        return out.drop("_step")

    # conformal_error: quantile of |error| added/subtracted from the mean
    cuts = [lv / 100 for lv in level]
    aggs = []
    for m in model_names:
        for lv, cut in zip(level, cuts):
            aggs.append(F.percentile(F.col(m), F.lit(cut)).alias(f"_q_{m}_{lv}"))
    qs = cs_df.groupBy(id_col, "_step").agg(*aggs)
    out = preds.join(qs, on=[id_col, "_step"], how="left")
    for m in model_names:
        for lv in level:
            out = out.withColumn(f"{m}-lo-{lv}", F.col(m) - F.col(f"_q_{m}_{lv}"))
            out = out.withColumn(f"{m}-hi-{lv}", F.col(m) + F.col(f"_q_{m}_{lv}"))
            out = out.drop(f"_q_{m}_{lv}")
    return out.drop("_step")
