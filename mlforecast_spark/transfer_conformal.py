"""Transfer conformal prediction: intervals for a target panel with little
history, calibrated from a source pipeline's conformity scores.

Reference: ``TransferConformal`` (`/root/reference/mlforecast/conformal_prediction.py:62-122`,
method impls `:842-1106`, frozen backtest `forecast.py:81-149`, orchestration
`forecast.py:1554-1853`). Transfer pooling follows the reference's
``is_transfer`` semantics: all source calibration points pool globally and the
per-horizon-step quantiles are tiled to every target series
(`conformal_prediction.py:247-341`).

Implemented methods:
- ``recalibrate``       — frozen backtest on the target (predict-only with the
                          source models via history warm-up) → target scores.
- ``scale_aligned``     — pooled source score quantiles, aligned by the ratio
                          of median target scale to median source scale.
- ``error_scaled``      — source scores normalized by their series' scale,
                          pooled, re-scaled per target series.
- ``weighted_conformal`` — density-ratio (source-vs-target covariates) weights
                          on source calibration points; per-step weighted
                          quantiles (Tibshirani et al. 2019, reference
                          `conformal_prediction.py:876-948,472-541`).
- ``scale_aligned_weighted`` — weighted quantiles of per-series-normalized
                          source scores, re-scaled by per-series target scale
                          (`conformal_prediction.py:989-1040`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .conformal import compute_series_scales
from .utils import time_plus

VALID_TRANSFER_METHODS = (
    "recalibrate",
    "scale_aligned",
    "error_scaled",
    "scale_aligned_weighted",
    "weighted_conformal",
)


class TransferConformal:
    """Predict-time configuration for transfer conformal prediction,
    mirroring the reference's config object
    (`/root/reference/mlforecast/conformal_prediction.py:62-122`): pass to
    ``MLForecast.predict(transfer_conformal=...)``; a plain string is
    shorthand for ``TransferConformal(method=<str>)``."""

    def __init__(
        self,
        method: str = "recalibrate",
        n_windows: Optional[int] = None,
        dre_estimator: str = "logistic",
    ):
        if method not in VALID_TRANSFER_METHODS:
            raise ValueError(
                f"TransferConformal.method must be one of "
                f"{VALID_TRANSFER_METHODS}, got {method!r}"
            )
        if dre_estimator != "logistic":
            raise ValueError(
                "this engine estimates density ratios with distributed IRLS "
                "logistic regression only; dre_estimator must be 'logistic'"
            )
        if n_windows is not None and n_windows < 1:
            raise ValueError(f"n_windows must be >= 1, got {n_windows}")
        self.method = method
        self.n_windows = n_windows
        self.dre_estimator = dre_estimator


def _pooled_step_quantiles(
    cs_df: DataFrame, model_names: Sequence[str], level: Sequence[float]
) -> DataFrame:
    """Per-horizon-step global quantiles of |score| for each level: the
    transfer pooling (`is_transfer=True`) path."""
    aggs = []
    for m in model_names:
        for lv in sorted(level):
            aggs.append(
                F.percentile(F.abs(F.col(f"`{m}`")), F.lit(lv / 100)).alias(
                    f"_q_{m}_{lv}"
                )
            )
    return cs_df.groupBy("_step").agg(*aggs)


def _attach(preds, qs, model_names, level, id_col, time_col, scale_col=None):
    w = Window.partitionBy(id_col).orderBy(time_col)
    out = preds.withColumn("_step", F.row_number().over(w)).join(
        qs, on="_step", how="left"
    )
    for m in model_names:
        for lv in sorted(level):
            q = F.col(f"_q_{m}_{lv}")
            if scale_col is not None:
                q = q * F.col(scale_col)
            out = out.withColumn(f"{m}-lo-{lv}", F.col(m) - q)
            out = out.withColumn(f"{m}-hi-{lv}", F.col(m) + q)
            out = out.drop(f"_q_{m}_{lv}")
    return out.drop("_step")


def transfer_intervals(
    source_mf,
    target_df: DataFrame,
    h: int,
    level: Sequence[float],
    method: str = "scale_aligned",
    n_windows: int = 2,
) -> DataFrame:
    """Forecast the target panel with the source models (history warm-up) and
    attach transfer-calibrated interval columns."""
    if method not in VALID_TRANSFER_METHODS:
        raise ValueError(f"method must be one of {VALID_TRANSFER_METHODS}")
    s = source_mf.schema_
    models = list(source_mf.models_)
    preds = source_mf.predict(h, new_df=target_df)

    if method in ("scale_aligned_weighted", "weighted_conformal"):
        source_cs = source_mf.cs_df_
        if source_cs is None:
            raise ValueError(
                "source pipeline has no conformity scores; fit it with "
                "prediction_intervals=PredictionIntervals(...)"
            )
        cs_w, w_test = _dre_weighted_scores(source_mf, target_df)
        if method == "weighted_conformal":
            qs = _weighted_pooled_step_quantiles(cs_w, models, level, w_test)
            return _attach(preds, qs, models, level, s.id_col, s.time_col)
        # scale_aligned_weighted: weighted quantiles of per-series-normalized
        # scores, half-widths re-scaled by each target series' own scale
        src_scales = compute_series_scales(
            source_mf.state_, s.id_col, s.time_col, s.target_col
        )
        cs_w = cs_w.join(src_scales, on=s.id_col, how="left")
        for m in models:
            cs_w = cs_w.withColumn(m, F.col(f"`{m}`") / F.col("scale"))
        qs = _weighted_pooled_step_quantiles(
            cs_w.drop("scale"), models, level, w_test
        )
        tgt_scales = compute_series_scales(
            target_df, s.id_col, s.time_col, s.target_col
        ).withColumnRenamed("scale", "_tgt_scale")
        preds = preds.join(tgt_scales, on=s.id_col, how="left").fillna(
            {"_tgt_scale": 1.0}
        )
        out = _attach(
            preds, qs, models, level, s.id_col, s.time_col, scale_col="_tgt_scale"
        )
        return out.drop("_tgt_scale")

    if method == "recalibrate":
        cs = _frozen_backtest_scores(source_mf, target_df, h, n_windows)
        qs = _pooled_step_quantiles(cs, models, level)
        return _attach(preds, qs, models, level, s.id_col, s.time_col)

    source_cs = source_mf.cs_df_
    if source_cs is None:
        raise ValueError(
            "source pipeline has no conformity scores; fit it with "
            "prediction_intervals=PredictionIntervals(...)"
        )

    if method == "scale_aligned":
        src_scale = compute_series_scales(
            source_mf.state_, s.id_col, s.time_col, s.target_col
        ).agg(F.percentile("scale", F.lit(0.5)).alias("_src"))
        tgt_scale = compute_series_scales(
            target_df, s.id_col, s.time_col, s.target_col
        ).agg(F.percentile("scale", F.lit(0.5)).alias("_tgt"))
        ratio = float(
            src_scale.crossJoin(tgt_scale)
            .select((F.col("_tgt") / F.col("_src")).alias("r"))
            .collect()[0]["r"]
        )
        qs = _pooled_step_quantiles(source_cs, models, level)
        for m in models:
            for lv in sorted(level):
                qs = qs.withColumn(f"_q_{m}_{lv}", F.col(f"_q_{m}_{lv}") * ratio)
        return _attach(preds, qs, models, level, s.id_col, s.time_col)

    # error_scaled: normalize source scores by their own series' scale, pool,
    # then re-scale per target series
    src_scales = compute_series_scales(
        source_mf.state_, s.id_col, s.time_col, s.target_col
    )
    normalized = source_cs.join(src_scales, on=s.id_col, how="left")
    for m in models:
        normalized = normalized.withColumn(m, F.col(f"`{m}`") / F.col("scale"))
    qs = _pooled_step_quantiles(normalized.drop("scale"), models, level)
    tgt_scales = compute_series_scales(
        target_df, s.id_col, s.time_col, s.target_col
    ).withColumnRenamed("scale", "_tgt_scale")
    preds = preds.join(tgt_scales, on=s.id_col, how="left").fillna(
        {"_tgt_scale": 1.0}
    )
    out = _attach(
        preds, qs, models, level, s.id_col, s.time_col, scale_col="_tgt_scale"
    )
    return out.drop("_tgt_scale")


def _dre_weighted_scores(source_mf, target_df: DataFrame):
    """Attach density-ratio weights ``_w`` to the source conformity scores.

    A distributed IRLS logistic classifier separates source calibration
    covariates (the fitted feature matrix at calibration rows) from target
    covariates (the source plan applied to the target history); weight =
    p/(1-p) clipped — the reference's DRE
    (`/root/reference/mlforecast/conformal_prediction.py:876-948`). Returns
    (weighted cs_df, w_test) where w_test is the mean target weight used as
    the test-point mass in the weighted quantile."""
    import copy

    from pyspark.sql import types as T

    from .conformal import estimate_density_ratio
    from .utils import qcol

    s = source_mf.schema_
    feats = source_mf._fitted_feats
    numeric = [
        c
        for c in source_mf.features_order_
        if isinstance(
            feats.schema[c].dataType,
            (T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.ShortType),
        )
    ]
    if not numeric:
        raise ValueError("no numeric feature columns available for the DRE")
    calib = source_mf.cs_df_.join(
        feats.select(s.id_col, s.time_col, *[qcol(c).alias(c) for c in numeric]),
        on=[s.id_col, s.time_col],
        how="inner",
    ).na.drop(subset=numeric)

    dfx = target_df
    for tfm in source_mf.target_transforms:
        if tfm.refit_on_warmup:
            t = copy.copy(tfm)
            dfx = t.fit_transform(dfx)
        else:
            dfx = tfm.transform(dfx)
    tgt_feats = (
        source_mf.plan_.apply(dfx)
        .select(*[qcol(c).alias(c) for c in numeric])
        .na.drop(subset=numeric)
    )
    clf, weight = estimate_density_ratio(
        calib.select(*numeric), tgt_feats, numeric
    )
    cs_w = calib.withColumn("_w", weight).drop(*numeric)
    w_test = float(
        tgt_feats.select(F.avg(weight).alias("w")).collect()[0]["w"] or 1.0
    )
    return cs_w, w_test


def _weighted_pooled_step_quantiles(
    cs: DataFrame,
    model_names: Sequence[str],
    level: Sequence[float],
    w_test: float,
) -> DataFrame:
    """Per-step weighted quantiles of |score| over the pooled source
    calibration points — the distributed form of the reference's
    ``_weighted_quantiles`` (`conformal_prediction.py:437-460`): sort within
    step, cumulative weight, first score whose cumulative mass reaches the
    cut; the appended test point carries ``w_test`` mass, so an unreachable
    cut yields +inf exactly like the reference.

    All JVM window expressions — one WindowExec per model ordering — so the
    quantile scales with executors instead of collecting scores."""
    df = cs
    for i, m in enumerate(model_names):
        df = df.withColumn(f"_abs_{i}", F.abs(F.col(f"`{m}`")))
    tot = F.sum("_w").over(Window.partitionBy("_step")) + F.lit(w_test)
    df = df.withColumn("_tot", tot)
    for i, m in enumerate(model_names):
        wspec = (
            Window.partitionBy("_step")
            .orderBy(F.col(f"_abs_{i}"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        df = df.withColumn(f"_cum_{i}", F.sum("_w").over(wspec))
    aggs = []
    for i, m in enumerate(model_names):
        for lv in sorted(level):
            cut = lv / 100
            aggs.append(
                F.coalesce(
                    F.min(
                        F.when(
                            F.col(f"_cum_{i}") >= F.lit(cut) * F.col("_tot"),
                            F.col(f"_abs_{i}"),
                        )
                    ),
                    F.lit(float("inf")),
                ).alias(f"_q_{m}_{lv}")
            )
    return df.groupBy("_step").agg(*aggs)


def _frozen_backtest_scores(
    source_mf, target_df: DataFrame, h: int, n_windows: int
) -> DataFrame:
    """Predict-only backtest on the target with the FROZEN source models
    (`/root/reference/mlforecast/forecast.py:81-149`): per window, warm up on
    the truncated target history, predict h, score against target actuals."""
    s = source_mf.schema_
    w_last = Window.partitionBy(s.id_col)
    df = target_df.withColumn("_max_ds", F.max(s.time_col).over(w_last))
    frames = []
    for i in range(n_windows):
        back = h * (n_windows - i)
        cutoff = time_plus(F.col("_max_ds"), source_mf.freq, -back)
        train = df.filter(F.col(s.time_col) <= cutoff).drop("_max_ds")
        valid = df.filter(
            (F.col(s.time_col) > cutoff)
            & (F.col(s.time_col) <= time_plus(cutoff, source_mf.freq, h))
        ).drop("_max_ds")
        preds = source_mf.predict(h, new_df=train)
        merged = valid.select(s.id_col, s.time_col, s.target_col).join(
            preds, on=[s.id_col, s.time_col], how="inner"
        )
        w = Window.partitionBy(s.id_col).orderBy(s.time_col)
        merged = merged.withColumn("_step", F.row_number().over(w))
        exprs = [
            (F.col(s.target_col) - F.col(f"`{m}`")).alias(m)
            for m in source_mf.models_
        ]
        frames.append(merged.select(s.id_col, "_step", *exprs))
    from functools import reduce

    return reduce(DataFrame.unionByName, frames)


@dataclass
class TransferResult:
    """Reference-name parity (`conformal_prediction.py:800-813`): the value a
    transfer method hands to predict — conformity scores plus optional
    weights/scales — instead of mutating interval config state."""

    cs_df: DataFrame
    weights: Optional[object] = None
    target_scales: Optional[dict] = None
    target_weights: Optional[object] = None
    signed: bool = False


@dataclass
class _TransferMethodSpec:
    """Capability flags per transfer method (reference ``:789-797``)."""

    method: str
    needs_source_cs: bool = False
    runs_target_cv: bool = False
    weighted: bool = False


_TRANSFER_METHOD_SPECS = {
    "recalibrate": _TransferMethodSpec("recalibrate", runs_target_cv=True),
    "scale_aligned": _TransferMethodSpec("scale_aligned", needs_source_cs=True),
    "error_scaled": _TransferMethodSpec("error_scaled", needs_source_cs=True),
    "scale_aligned_weighted": _TransferMethodSpec(
        "scale_aligned_weighted", needs_source_cs=True, weighted=True
    ),
    "weighted_conformal": _TransferMethodSpec(
        "weighted_conformal", needs_source_cs=True, weighted=True
    ),
}


def get_transfer_method_spec(method: str) -> _TransferMethodSpec:
    """Reference-name parity (`conformal_prediction.py:1107-1113`)."""
    if method not in _TRANSFER_METHOD_SPECS:
        raise ValueError(
            f"transfer conformal method {method} not supported "
            f"please choose one of {', '.join(VALID_TRANSFER_METHODS)}"
        )
    return _TRANSFER_METHOD_SPECS[method]
