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
    target_col: str = "y",
    freq: Freq = "D",
) -> DataFrame:
    """Per-series stats + gap/duplicate flags.

    expected_rows = number of freq steps between start and end inclusive;
    has_gaps = distinct timestamps < expected; has_dups = rows > distinct.
    """
    unit, step = parse_freq(freq)
    agg = df.groupBy(id_col).agg(
        F.min(time_col).alias("start"),
        F.max(time_col).alias("end"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(time_col).alias("n_unique"),
        F.sum(F.when(F.col(target_col).isNull(), 1).otherwise(0)).alias("n_null_target"),
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
