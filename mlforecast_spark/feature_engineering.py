"""Standalone feature engineering over arbitrary (exogenous) columns.

Mirrors ``transform_exog``
(`/root/reference/mlforecast/feature_engineering.py:15-69`): the same Window
library applied to any value column; feature names are prefixed with the
source column (``price_lag7``, ``price_rolling_mean_lag1_window_size7``).

Also carries the companion-library deterministic regressors reference
users pair with mlforecast (``utilsforecast.feature_engineering``):
:func:`fourier`, :func:`trend` and :func:`pipeline`, each returning the
``(transformed, future)`` frame pair so the future features can go
straight into ``predict(X_df=...)``. All are pure Column expressions over
a per-series positional index (one ``row_number`` window — the same
shuffle class as any lag feature; the future frame derives from a tiny
per-series (max ts, count) aggregate + sequence/explode, never a window
over generated rows).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .core import FeaturePlan, PanelSchema, _parse_transforms
from .utils import Freq, qcol, time_plus


def transform_exog(
    df: DataFrame,
    lags: Optional[Sequence[int]] = None,
    lag_transforms: Optional[dict] = None,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> DataFrame:
    """Compute lag features over every non-id/time column of ``df``."""
    value_cols = [c for c in df.columns if c not in (id_col, time_col)]
    if not value_cols:
        raise ValueError("df has no value columns to transform")
    out = df
    for col in value_cols:
        registry = _parse_transforms(list(lags or []), lag_transforms or {})
        plan = FeaturePlan(
            schema=PanelSchema(id_col=id_col, time_col=time_col, target_col=col),
            registry=registry,
        )
        with_feats = plan.apply(out)
        renames = {name: f"{col}_{name}" for name in registry}
        out = with_feats.select(
            *[F.col(c) for c in out.columns],
            *[qcol(n).alias(rn) for n, rn in renames.items()],
        )
    return out


def _with_positions(
    df: DataFrame, id_col: str, time_col: str
) -> tuple[DataFrame, DataFrame]:
    """(df + 1-based per-series position ``_t``, per-series (last ts, n)
    frame). One row_number window; the stats frame is a tiny agg."""
    w = Window.partitionBy(id_col).orderBy(time_col)
    with_t = df.withColumn("_t", F.row_number().over(w))
    stats = df.groupBy(id_col).agg(
        F.max(time_col).alias("_last"), F.count("*").alias("_n")
    )
    return with_t, stats


def _future_positions(
    stats: DataFrame, freq: Freq, h: int, id_col: str, time_col: str, ds_type
) -> DataFrame:
    """ids × next h timestamps with the series' position index continued
    (``_t`` = n+1 .. n+h). The timestamp is cast back to the input time
    type (time_plus promotes DATE to TIMESTAMP)."""
    if h < 1:
        # sequence(1, 0) defaults to step -1 and yields [1, 0] — two
        # spurious rows per series (step 0 duplicating the last in-sample
        # timestamp). h=0 means "no future frame": empty, same schema.
        stats = stats.where(F.lit(False))
        h = 1
    out = stats.select(
        id_col, "_last", "_n",
        F.explode(F.sequence(F.lit(1), F.lit(int(h)))).alias("_step"),
    )
    return out.select(
        id_col,
        time_plus(F.col("_last"), freq, F.col("_step")).cast(ds_type).alias(time_col),
        (F.col("_n") + F.col("_step")).alias("_t"),
    )


def _fourier_cols(season_length: int, k: int) -> list:
    cols = []
    for j in range(1, k + 1):
        ang = 2.0 * math.pi * j / season_length
        cols.append(F.sin(F.col("_t") * ang).alias(f"sin{j}_{season_length}"))
        cols.append(F.cos(F.col("_t") * ang).alias(f"cos{j}_{season_length}"))
    return cols


def fourier(
    df: DataFrame,
    freq: Freq,
    season_length: int,
    k: int,
    h: int = 0,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> tuple[DataFrame, DataFrame]:
    """Fourier seasonal terms ``sin{j}_{season_length}`` /
    ``cos{j}_{season_length}`` for j=1..k over each series' positional
    index (the companion library's ``fourier`` contract: deterministic
    regressors usable at any horizon). Returns ``(transformed, future)``;
    ``future`` holds the next ``h`` steps per series (empty-schema'd but
    row-free when ``h=0``)."""
    with_t, stats = _with_positions(df, id_col, time_col)
    cols = _fourier_cols(season_length, k)
    transformed = with_t.select(*df.columns, *cols)
    fut = _future_positions(stats, freq, max(h, 0), id_col, time_col, df.schema[time_col].dataType)
    future = fut.select(id_col, time_col, *cols)
    return transformed, future


def trend(
    df: DataFrame,
    freq: Freq,
    h: int = 0,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> tuple[DataFrame, DataFrame]:
    """Linear trend regressor: the 1-based per-series position, continued
    into the future frame."""
    with_t, stats = _with_positions(df, id_col, time_col)
    transformed = with_t.select(*df.columns, F.col("_t").cast("double").alias("trend"))
    fut = _future_positions(stats, freq, max(h, 0), id_col, time_col, df.schema[time_col].dataType)
    future = fut.select(id_col, time_col, F.col("_t").cast("double").alias("trend"))
    return transformed, future


def pipeline(
    df: DataFrame,
    features: Sequence[Union[Callable, tuple]],
    freq: Freq,
    h: int = 0,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> tuple[DataFrame, DataFrame]:
    """Apply several deterministic-regressor builders in ONE pass: the
    positional window and the per-series stats are computed once and every
    feature is a Column over them (the naive composition would pay one
    row_number shuffle per feature). ``features`` entries are either the
    :func:`fourier`/:func:`trend` functions themselves (defaults) or
    ``(fn, kwargs)`` tuples, e.g. ``(fourier, {'season_length': 7, 'k': 2})``.
    """
    with_t, stats = _with_positions(df, id_col, time_col)
    fut = _future_positions(stats, freq, max(h, 0), id_col, time_col, df.schema[time_col].dataType)
    cols: list = []
    for entry in features:
        fn, kwargs = entry if isinstance(entry, tuple) else (entry, {})
        if fn is fourier:
            missing = [k for k in ("season_length", "k") if k not in kwargs]
            if missing:
                raise ValueError(
                    "pipeline fourier entry requires kwargs "
                    f"{missing}: pass (fourier, {{'season_length': ..., 'k': ...}})"
                )
            cols.extend(_fourier_cols(kwargs["season_length"], kwargs["k"]))
        elif fn is trend:
            cols.append(F.col("_t").cast("double").alias("trend"))
        else:
            raise ValueError(
                f"unsupported pipeline feature: {fn!r} — supported entries are "
                "the fourier and trend functions from this module, optionally "
                "as (fn, kwargs) tuples"
            )
    transformed = with_t.select(*df.columns, *cols)
    future = fut.select(id_col, time_col, *cols)
    return transformed, future
