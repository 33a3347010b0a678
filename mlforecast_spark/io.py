"""Panel IO helpers: partitioned/bucketed layouts for 100 TB-scale panels.

The reference persists state via cloudpickle/fsspec
(`/root/reference/mlforecast/core.py:2002-2010`); here panels and state are
tables, so the IO story is layout: date-partitioned Parquet for pruning, and
id-bucketed tables so per-series operations (windows, applyInPandas) join and
group without a shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_panel(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    validate: bool = False,
    freq=None,
) -> DataFrame:
    """Load a long-format panel and optionally validate the schema contract."""
    df = spark.read.format(format).load(path)
    missing = [c for c in (id_col, time_col, target_col) if c not in df.columns]
    if missing:
        raise ValueError(f"panel at {path} is missing columns {missing}")
    if validate:
        from .data_validation import validate_panel

        validate_panel(df, id_col, time_col, target_col, freq or "D")
    return df


def write_panel_partitioned(
    df: DataFrame,
    path: str,
    time_col: str = "ds",
    granularity: str = "month",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned Parquet: scans with time filters prune whole
    partitions (the `.explain` shows PartitionFilters instead of row filters)."""
    part = F.date_trunc(granularity, F.col(time_col)).cast("date").alias("_part")
    df.withColumn("_part", part).write.mode(mode).partitionBy("_part").parquet(path)


def write_panel_bucketed(
    df: DataFrame,
    table_name: str,
    id_col: str = "unique_id",
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Id-bucketed managed table: joins/groupBys on the id hit the bucketing
    and skip the shuffle (co-located join). Requires a metastore-backed
    session; use for repeatedly-queried panels."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, id_col)
        .sortBy(id_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def repartition_by_series(
    df: DataFrame, id_col: str = "unique_id", partitions: Optional[int] = None
) -> DataFrame:
    """Hash-partition by series id so per-series applyInPandas operators run
    without an extra exchange. Window transforms don't need this (Catalyst
    plans the shuffle); use it before chains of per-series Python ops."""
    if partitions:
        return df.repartition(partitions, F.col(id_col))
    return df.repartition(F.col(id_col))


def _zorder_bin_expr(col_name: str, dtype: str, boundaries) -> "F.Column":
    """Equi-depth bin id (0..n_bins-1) for one z-order column: the count of
    quantile boundaries strictly below the value — an O(n_bins) JVM
    aggregate over a literal array, no shuffle. Nulls land in bin 0 (they
    sort together at the low corner of the curve)."""
    dtype = dtype.lower()
    c = F.col(col_name)
    if dtype.startswith("timestamp"):
        c = F.unix_micros(c.cast("timestamp"))
    elif dtype == "date":
        c = F.unix_date(c)
    if not boundaries:  # constant or all-null column: one bin
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    cnt = F.aggregate(
        F.transform(arr, lambda b: (c.cast("double") > b).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return F.coalesce(cnt, F.lit(0))


def write_panel_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 64,
    bits_per_col: int = 8,
    mode: str = "error",
) -> None:
    """Z-order (Morton-curve) clustered Parquet write: files are clustered
    on EVERY listed column at once, so parquet footer min/max statistics
    prune scans filtered on ANY of them — the multi-dimensional layout a
    date-partition or single-column sort cannot give (sorting by col A
    leaves col B's per-file range at ~the global range; the space-filling
    curve shrinks both). The lakehouse formats ship this as OPTIMIZE
    ZORDER BY; plain Parquet gets the same effect from layout alone.

    Shape: one sampled ``approxQuantile`` pass computes equi-depth bin
    boundaries per column (equi-depth keeps files balanced under skew,
    where linear min/max binning would pile everything into a few bins);
    each row's bins interleave bitwise into one LONG Morton key (pure JVM
    expressions), and the frame range-partitions + sorts on that key —
    exactly one shuffle for the whole layout, any scale. Numeric,
    timestamp and date columns only (quantile binning needs an ordered
    numeric domain); up to 8 columns at 8 bits each.
    """
    cols = list(cols)
    if not 1 <= len(cols) <= 8:
        raise ValueError(f"z-order needs 1-8 columns, got {len(cols)}")
    if bits_per_col * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits exceeds the 63-bit key"
        )
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"z-order columns not in frame: {missing}")
    n_bins = 1 << bits_per_col
    num = df
    for c in cols:
        dt = dtypes[c].lower()
        if dt.startswith("timestamp"):
            num = num.withColumn(c, F.unix_micros(F.col(c).cast("timestamp")))
        elif dt == "date":
            num = num.withColumn(c, F.unix_date(F.col(c)))
        elif dt not in ("tinyint", "smallint", "int", "bigint", "float", "double") and not dt.startswith("decimal"):
            raise ValueError(
                f"z-order column {c!r} has unsupported type {dtypes[c]}"
            )
    probs = [i / n_bins for i in range(1, n_bins)]
    quantiles = num.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    ).approxQuantile(cols, probs, 0.001)

    k = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        b = _zorder_bin_expr(c, dtypes[c], sorted(set(quantiles[i])))
        for j in range(bits_per_col):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), j * k + i)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_mb: int = 512,
) -> int:
    """Rewrite a parquet dataset with right-sized files — the small-files
    fix: streaming ingests and fine-grained partitioning leave thousands of
    KB-scale files whose open/footer cost dominates scans at 100 TB.
    Sizes the shuffle from the ACTUAL byte size of the source (via the
    Hadoop FileSystem, so any scheme works), not a row-count guess, and
    writes to ``dest_path`` (never in place — reading and overwriting the
    same location is a data-loss foot-gun Spark only sometimes catches).
    Returns the number of output files."""
    import math

    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df.repartition(n).write.mode("error").parquet(dest_path)
    return n
