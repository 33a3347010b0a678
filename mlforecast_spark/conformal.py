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

    _METHODS = (
        "conformal_distribution",
        "conformal_error",
        "weighted_conformal_distribution",
        "weighted_conformal_error",
    )

    def __init__(self, n_windows: int = 2, h: int = 1, method: str = "conformal_distribution"):
        if n_windows < 2:
            raise ValueError("You need at least two windows to compute conformal intervals")
        if method not in self._METHODS:
            raise ValueError(f"method must be one of {self._METHODS}")
        self.n_windows = n_windows
        self.h = h
        self.method = method

    def __repr__(self):
        return (
            f"PredictionIntervals(n_windows={self.n_windows}, h={self.h}, "
            f"method='{self.method}')"
        )


def compute_series_scales(
    df: DataFrame,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    estimator: str = "mad",
    floor: float = 1e-8,
) -> DataFrame:
    """Per-series scale of the differenced target (MAD or std of Δy, floored)
    — `/root/reference/mlforecast/conformal_prediction.py:124-198`."""
    if estimator not in ("mad", "std"):
        raise ValueError("estimator must be 'mad' or 'std'")
    w = Window.partitionBy(id_col).orderBy(time_col)
    d = df.withColumn("_dy", F.col(target_col) - F.lag(target_col).over(w)).filter(
        F.col("_dy").isNotNull()
    )
    if estimator == "mad":
        med = d.groupBy(id_col).agg(F.percentile("_dy", F.lit(0.5)).alias("_med"))
        out = (
            d.join(med, on=id_col)
            .withColumn("_adev", F.abs(F.col("_dy") - F.col("_med")))
            .groupBy(id_col)
            .agg(F.percentile("_adev", F.lit(0.5)).alias("scale"))
        )
    else:
        out = d.groupBy(id_col).agg(F.stddev_samp("_dy").alias("scale"))
    return out.withColumn("scale", F.greatest(F.col("scale"), F.lit(floor)))


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
        if method.endswith("conformal_error"):
            err = F.abs(err)
        exprs.append(err.alias(m))
    # ds kept so weighted methods can join covariates back for the DRE
    return out.select(id_col, time_col, "_step", *exprs)


def estimate_density_ratio(
    calib_feats: DataFrame,
    recent_feats: DataFrame,
    feature_cols: Sequence[str],
) -> "tuple":
    """Covariate-shift weights via a logistic density-ratio estimator
    (`/root/reference/mlforecast/conformal_prediction.py:646-748` analog):
    label calibration rows 0 and recent (test-like) rows 1, fit logistic
    regression distributed (IRLS sufficient statistics), weight = p/(1-p),
    clipped to [0.05, 20]."""
    from .models import LogisticRegression

    both = calib_feats.withColumn("_lbl", F.lit(0.0)).unionByName(
        recent_feats.withColumn("_lbl", F.lit(1.0))
    )
    clf = LogisticRegression()
    clf.fit_spark(both, feature_cols, "_lbl")
    p = clf.predict_proba_col(feature_cols)
    ratio = p / (F.lit(1.0) - p + F.lit(1e-12))
    weight = F.least(F.greatest(ratio, F.lit(0.05)), F.lit(20.0))
    return clf, weight


def weighted_interval_columns(
    preds: DataFrame,
    cs_df: DataFrame,
    model_names: Sequence[str],
    level: Sequence[float],
    method: str,
    id_col: str,
    time_col: str,
) -> DataFrame:
    """Weighted-quantile variant: cs_df must carry a ``_w`` column. Quantiles
    use the inverted weighted CDF per (id, step) via one applyInPandas pass
    (groups are tiny: 2·n_windows scores)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    level = sorted(level)
    if "_step" not in preds.columns:
        w = Window.partitionBy(id_col).orderBy(time_col)
        preds = preds.withColumn("_step", F.row_number().over(w))
    distribution = method.endswith("distribution")
    if distribution:
        alphas = [100 - lv for lv in level]
        cuts = [a / 200 for a in reversed(alphas)] + [1 - a / 200 for a in alphas]
        cut_names = [f"lo-{lv}" for lv in reversed(level)] + [f"hi-{lv}" for lv in level]
    else:
        cuts = [lv / 100 for lv in level]
        cut_names = [str(lv) for lv in level]

    out_fields = [
        T.StructField(id_col, cs_df.schema[id_col].dataType),
        T.StructField("_step", T.IntegerType()),
    ]
    for m in model_names:
        for cn in cut_names:
            out_fields.append(T.StructField(f"_q_{m}_{cn}", T.DoubleType()))
    out_schema = T.StructType(out_fields)
    models = list(model_names)

    def wq(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {id_col: [pdf[id_col].iloc[0]], "_step": [int(pdf["_step"].iloc[0])]}
        ws = pdf["_w"].to_numpy(dtype="float64")
        for m in models:
            s = pdf[m].to_numpy(dtype="float64")
            if distribution:
                s = np.concatenate([s, -s])
                wts = np.concatenate([ws, ws])
            else:
                wts = ws
            order = np.argsort(s)
            s_sorted, w_sorted = s[order], wts[order]
            cum = np.cumsum(w_sorted) / w_sorted.sum()
            for cut, cn in zip(cuts, cut_names):
                idx = int(np.searchsorted(cum, cut, side="left"))
                idx = min(idx, len(s_sorted) - 1)
                row[f"_q_{m}_{cn}"] = [float(s_sorted[idx])]
        return pd.DataFrame(row)

    qs = cs_df.groupBy(id_col, "_step").applyInPandas(wq, schema=out_schema)
    out = preds.join(qs, on=[id_col, "_step"], how="left")
    for m in model_names:
        if distribution:
            for cn in cut_names:
                out = out.withColumn(f"{m}-{cn}", F.col(m) + F.col(f"_q_{m}_{cn}")).drop(
                    f"_q_{m}_{cn}"
                )
        else:
            for lv, cn in zip(level, cut_names):
                q = F.col(f"_q_{m}_{cn}")
                out = out.withColumn(f"{m}-lo-{lv}", F.col(m) - q)
                out = out.withColumn(f"{m}-hi-{lv}", F.col(m) + q)
                out = out.drop(f"_q_{m}_{cn}")
    return out.drop("_step")


def add_interval_columns(
    preds: DataFrame,
    cs_df: DataFrame,
    model_names: Sequence[str],
    level: Sequence[float],
    method: str,
    id_col: str,
    time_col: str,
) -> DataFrame:
    """Attach `{model}-lo-{lv}` / `{model}-hi-{lv}` columns. A `_step`
    column already on ``preds`` (direct mode) wins over positional
    renumbering — sparse horizon subsets keep their true calibration step."""
    level = sorted(level)
    if "_step" not in preds.columns:
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


def get_conformal_method(method: str):
    """Reference-name parity (`conformal_prediction.py:749-755`): validate an
    interval method name and resolve it to the score builder used at predict
    time (a partial of :func:`conformity_scores`)."""
    import functools

    if method not in PredictionIntervals._METHODS:
        raise ValueError(
            f"prediction intervals method {method} not supported "
            f"please choose one of {', '.join(PredictionIntervals._METHODS)}"
        )
    return functools.partial(conformity_scores, method=method)


def compute_conformity_scores(
    cv_results: DataFrame,
    model_names: Sequence[str],
    target_col: str,
    feature_cols: Optional[Sequence[str]] = None,
    signed: bool = False,
) -> DataFrame:
    """Reference-signature conformity scores (`conformal_prediction.py:
    758-786`): replace each model column with its error vs the target, drop
    the target, optionally move ``feature_cols`` to the end. Pure
    projection — no shuffle, no action."""
    model_set = set(model_names)
    exprs = []
    for c in cv_results.columns:
        if c == target_col:
            continue
        if c in model_set:
            err = (
                (F.col(target_col) - F.col(c))
                if signed
                else F.abs(F.col(c) - F.col(target_col))
            )
            exprs.append(err.alias(c))
        else:
            exprs.append(F.col(c))
    out = cv_results.select(*exprs)
    if feature_cols is not None:
        keep = [c for c in out.columns if c not in set(feature_cols)]
        out = out.select(*keep, *feature_cols)
    return out
