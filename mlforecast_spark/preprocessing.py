"""Panel preprocessing: calendar completion (``fill_gaps``).

The reference's validation errors tell users to "use the fill_gaps
parameter" (`/root/reference/mlforecast/data_validation.py:198,227`); the
function itself lives in the companion ``utilsforecast.preprocessing``
library that reference users call to regularize a panel before ``fit``.
This is that operator re-expressed as a Spark plan.

Semantics (mirroring ``utilsforecast.preprocessing.fill_gaps``): for each
series, emit one row per ``freq`` step from ``start`` to ``end``
inclusive; rows present in the input keep their values, generated rows
carry NULL in every non-key column.

``start`` / ``end`` each accept:

- ``'per_serie'`` — the series' own min (resp. max) timestamp;
- ``'global'``    — the min (resp. max) across ALL series;
- an explicit value (timestamp/date/int matching the time column).

Scale shape: one tiny per-series agg for the limits, a broadcast one-row
global agg only when requested, a two-level ``sequence``/``explode`` to
generate the calendar (arrays are capped at ``chunk`` steps so a
years-of-seconds series never materializes its whole calendar in one row),
and ONE left join of the grid against the panel on (id, time) — the only
full-panel shuffle, which AQE plans (broadcasting the grid side when it is
the small one). No window over raw rows, no collect.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame, functions as F

from .utils import Freq, parse_freq, time_plus

_UNIT_MICROS = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _steps_between(start: Column, end: Column, freq: Freq) -> Column:
    """Number of WHOLE freq steps from start to end (floor; >=0 when
    end >= start). Integer arithmetic end-to-end — unix micros for
    sub-month units (exact for the +-2^53 us range, i.e. any realistic
    timestamp), months_between for calendar units."""
    unit, step = parse_freq(freq)
    if unit == "int":
        d = end - start
        return ((d - d % F.lit(step)) / F.lit(step)).cast("long")
    if unit in _UNIT_MICROS:
        us = step * _UNIT_MICROS[unit]
        delta = F.unix_micros(end.cast("timestamp")) - F.unix_micros(
            start.cast("timestamp")
        )
        # (delta - delta%us)/us: the subtraction stays in LONG arithmetic
        # and the final quotient is an exact integer below 2^53, so the
        # double division cannot round — plain floor(delta/us) could, for
        # deltas within an ulp of a multiple
        return ((delta - delta % F.lit(us)) / F.lit(us)).cast("long")
    n_months = F.lit(step if unit == "month" else step * 12)
    # months_between is exact (returns whole doubles) when both dates share
    # the day-of-month or are both month-ends — the only panels a monthly
    # freq can describe; floor guards ragged inputs
    return F.floor(F.months_between(end, start) / n_months).cast("long")


def fill_gaps(
    df: DataFrame,
    freq: Freq,
    start: Union[str, object] = "per_serie",
    end: Union[str, object] = "global",
    id_col: str = "unique_id",
    time_col: str = "ds",
    chunk: int = 4096,
    on_grid: bool = False,
) -> DataFrame:
    """Complete each series' calendar at ``freq`` between ``start`` and
    ``end`` (both inclusive); missing rows appear with NULLs in every
    non-key column. See module docstring for the accepted ``start``/``end``
    forms and the distributed plan shape.

    Rows whose timestamp is NOT on the (start + k*freq) grid are KEPT
    (the grid is unioned with the observed timestamps, never used as a
    filter) — a deliberate lossless superset of the companion library,
    which assumes grid-aligned input; run ``validate_df`` first if you
    need that assumption checked. Input rows before an explicit ``start``
    / after an explicit ``end`` are dropped.

    ``on_grid=True`` declares every input timestamp to be on the freq grid
    (e.g. after :func:`mlforecast_spark.data_validation.validate_df`) and
    skips the union+distinct shuffle that exists only to keep off-grid
    rows — at large scale that removes one full pass over the (id, time)
    pairs; off-grid rows are silently DROPPED under this flag.
    """
    ds_type = df.schema[time_col].dataType
    limits = df.groupBy(id_col).agg(
        F.min(time_col).alias("_start"), F.max(time_col).alias("_end")
    )

    def _is_mode(v, name: str) -> bool:
        return isinstance(v, str) and v == name

    if _is_mode(start, "global") or _is_mode(end, "global"):
        g = df.agg(
            F.min(time_col).alias("_gstart"), F.max(time_col).alias("_gend")
        )
        limits = limits.crossJoin(F.broadcast(g))

    if _is_mode(start, "per_serie"):
        start_col = F.col("_start")
    elif _is_mode(start, "global"):
        start_col = F.col("_gstart")
    else:
        start_col = F.lit(start).cast(ds_type)
    if _is_mode(end, "per_serie"):
        end_col = F.col("_end")
    elif _is_mode(end, "global"):
        end_col = F.col("_gend")
    else:
        end_col = F.lit(end).cast(ds_type)

    limits = limits.select(
        id_col, start_col.alias("_s"), end_col.alias("_e")
    ).filter(F.col("_s").isNotNull() & (F.col("_s") <= F.col("_e")))

    n = _steps_between(F.col("_s"), F.col("_e"), freq)
    # two-level generation: chunk starts (array <= n/chunk+1 elements),
    # then <= `chunk` fine steps per chunk row — bounds any single array
    coarse = limits.select(
        id_col,
        "_s",
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n, F.lit(int(chunk)))).alias("_b"),
    )
    fine = coarse.select(
        id_col,
        "_s",
        F.explode(
            F.sequence(
                F.col("_b"), F.least(F.col("_b") + (int(chunk) - 1), F.col("_n"))
            )
        ).alias("_k"),
    )
    grid = fine.select(
        id_col,
        time_plus(F.col("_s"), freq, F.col("_k")).cast(ds_type).alias(time_col),
    )

    if on_grid:
        keys = grid
    else:
        # observed timestamps off the freq grid survive via the union; the
        # distinct collapses grid rows that coincide with observed ones
        keys = grid.unionByName(df.select(id_col, time_col)).distinct()
        if not (_is_mode(start, "per_serie") or _is_mode(start, "global")):
            keys = keys.filter(F.col(time_col) >= F.lit(start).cast(ds_type))
        if not (_is_mode(end, "per_serie") or _is_mode(end, "global")):
            keys = keys.filter(F.col(time_col) <= F.lit(end).cast(ds_type))

    return keys.join(df, [id_col, time_col], "left").select(
        id_col, time_col, *[c for c in df.columns if c not in (id_col, time_col)]
    )
