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
