"""Panel validation: gap/duplicate detection per series.

Mirrors `/root/reference/mlforecast/data_validation.py:27-145` (per-id
min/max/count/countDistinct + expected-count arithmetic) as one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .utils import Freq, parse_freq


def series_stats(
    df: DataFrame,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str | None = "y",
    freq: Freq = "D",
) -> DataFrame:
    """Per-series stats + gap/duplicate flags.

    expected_rows = number of freq steps between start and end inclusive;
    has_gaps = distinct timestamps < expected; has_dups = rows > distinct.
    ``target_col=None`` skips the null-target count (time-axis-only checks).
    """
    unit, step = parse_freq(freq)
    null_target = (
        F.sum(F.when(F.col(target_col).isNull(), 1).otherwise(0))
        if target_col is not None
        else F.lit(0)
    )
    agg = df.groupBy(id_col).agg(
        F.min(time_col).alias("start"),
        F.max(time_col).alias("end"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(time_col).alias("n_unique"),
        null_target.alias("n_null_target"),
    )
    if unit == "int":
        span = (F.col("end") - F.col("start")) / step
    elif unit == "day":
        span = F.datediff("end", "start") / step
    elif unit == "hour":
        span = (F.unix_timestamp("end") - F.unix_timestamp("start")) / (3600 * step)
    elif unit == "minute":
        span = (F.unix_timestamp("end") - F.unix_timestamp("start")) / (60 * step)
    elif unit == "second":
        span = (F.unix_timestamp("end") - F.unix_timestamp("start")) / step
    elif unit == "month":
        span = (
            (F.year("end") - F.year("start")) * 12 + (F.month("end") - F.month("start"))
        ) / step
    else:  # year
        span = (F.year("end") - F.year("start")) / step
    expected = (F.floor(span) + 1).cast("long")
    return agg.select(
        id_col,
        "start",
        "end",
        "n_rows",
        "n_unique",
        "n_null_target",
        expected.alias("expected_rows"),
        (F.col("n_unique") < expected).cast("int").alias("has_gaps"),
        (F.col("n_rows") > F.col("n_unique")).cast("int").alias("has_dups"),
    )


def validate_panel(
    df: DataFrame,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    freq: Freq = "D",
    raise_on_invalid: bool = True,
) -> DataFrame:
    """Return series with problems; optionally raise if any exist."""
    stats = series_stats(df, id_col, time_col, target_col, freq)
    bad = stats.filter(
        (F.col("has_gaps") == 1) | (F.col("has_dups") == 1) | (F.col("n_null_target") > 0)
    )
    if raise_on_invalid:
        sample = bad.limit(5).collect()
        if sample:
            ids = [r[id_col] for r in sample]
            raise ValueError(
                f"Invalid panel: series with gaps/duplicates/null targets, e.g. {ids}"
            )
    return bad


# ---------------------------------------------------------------------------
# reference-named validators (`/root/reference/mlforecast/data_validation.py`
# :27-228) — same contracts, Spark-native: each returns/raises from ONE
# aggregation job; bad_df carries just the offending ids
# ---------------------------------------------------------------------------

def validate_continuity(
    df: DataFrame,
    id_col: str = "unique_id",
    time_col: str = "ds",
    freq: Freq = "D",
):
    """Gap/duplicate check per series (reference ``:86-145``).

    Returns ``(has_issues, bad_df)``; ``bad_df`` holds ``id_col`` for the
    affected series. One groupBy job (min/max/count/countDistinct + the
    expected-span arithmetic of :func:`series_stats`)."""
    stats = series_stats(df, id_col, time_col, target_col=None, freq=freq)
    bad = stats.filter(
        (F.col("has_gaps") == 1) | (F.col("has_dups") == 1)
    ).select(id_col)
    sample = bad.limit(1).collect()
    return (len(sample) > 0, bad)


def validate_update_start_dates(
    df: DataFrame,
    id_col: str,
    time_col: str,
    last_dates_df: DataFrame,
    freq: Freq,
):
    """Each updated series must start exactly at ``last + freq``
    (reference ``:27-83``). ``last_dates_df`` carries ``(id_col, _last)``;
    new series (no ``_last`` row) are always valid. Returns
    ``(has_issues, bad_df)``."""
    from .utils import time_plus

    starts = df.groupBy(id_col).agg(F.min(time_col).alias("_start"))
    joined = starts.join(F.broadcast(last_dates_df), on=id_col, how="inner")
    bad = joined.filter(
        F.col("_start") != time_plus(F.col("_last"), freq, 1)
    ).select(id_col)
    sample = bad.limit(1).collect()
    return (len(sample) > 0, bad)


def validate_update_df(
    df: DataFrame,
    id_col: str,
    time_col: str,
    last_dates_df: DataFrame,
    freq: Freq,
) -> None:
    """Raise unless the update both starts where each known series left off
    and is internally gap/duplicate-free (reference ``:148-199``; the
    reference takes parallel uids/last_dates arrays — the Spark port takes
    them as a ``(id_col, _last)`` frame, the shape ``update()`` stores)."""
    bad_start, bad_df = validate_update_start_dates(
        df, id_col, time_col, last_dates_df, freq
    )
    if bad_start:
        ids = [r[id_col] for r in bad_df.limit(5).collect()]
        raise ValueError(
            f"Series must be updated starting at their last date + freq. "
            f"Affected series: {ids}"
        )
    has_issues, bad = validate_continuity(df, id_col, time_col, freq)
    if has_issues:
        ids = [r[id_col] for r in bad.limit(5).collect()]
        raise ValueError(
            f"Series contain missing or duplicate timestamps with the "
            f"specified freq {freq}\nAffected series: {ids}"
        )


def validate_df(
    df: DataFrame,
    id_col: str = "unique_id",
    time_col: str = "ds",
    freq: Freq = "D",
) -> None:
    """Raise if any series has gaps or duplicate timestamps
    (reference ``:202-228``)."""
    has_issues, bad = validate_continuity(df, id_col, time_col, freq)
    if has_issues:
        ids = [r[id_col] for r in bad.limit(5).collect()]
        raise ValueError(
            f"Series contain missing or duplicate timestamps with the "
            f"specified freq {freq}\nAffected series: {ids}\n"
            f"Consider mlforecast_spark.preprocessing.fill_gaps or "
            f"preprocessing your data."
        )
