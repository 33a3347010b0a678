"""Differential tests for the distributed as-of join: DuckDB's native
ASOF JOIN and pandas.merge_asof are the oracles (same two-oracle strategy as
test_pooled.py — DuckDB for the SQL-expressible core, pandas for the
tolerance/direction/exact-match matrix DuckDB's ASOF doesn't parametrize)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.joins import asof_join


@pytest.fixture(scope="module")
def feeds(spark):
    """Irregular quotes (right) and trades (left) over 3 symbols; integer
    timestamps with gaps, duplicates on the right, and left rows before any
    right row (must come back null)."""
    rng = np.random.default_rng(7)
    trades, quotes = [], []
    for sym in ["A", "B", "C"]:
        t = np.unique(rng.integers(0, 500, size=60))
        for ts in t:
            trades.append((sym, int(ts), float(rng.integers(1, 100))))
        qt = np.unique(rng.integers(10, 480, size=40))
        for ts in qt:
            quotes.append((sym, int(ts), round(float(rng.normal(100, 5)), 3)))
    ldf = spark.createDataFrame(trades, "sym string, ts long, size double")
    rdf = spark.createDataFrame(quotes, "sym string, ts long, px double")
    return ldf, rdf, pd.DataFrame(trades, columns=["sym", "ts", "size"]), pd.DataFrame(
        quotes, columns=["sym", "ts", "px"]
    )


def _spark_result(ldf, rdf, **kw):
    out = asof_join(ldf, rdf, on="ts", by=["sym"], **kw).toPandas()
    return out.sort_values(["sym", "ts"]).reset_index(drop=True)


def test_backward_matches_duckdb_asof(spark, feeds):
    ldf, rdf, lp, rp = feeds
    got = _spark_result(ldf, rdf)
    con = duckdb.connect()
    con.register("trades", lp)
    con.register("quotes", rp)
    exp = con.execute(
        "SELECT t.sym, t.ts, t.size, q.px FROM trades t "
        "ASOF LEFT JOIN quotes q ON t.sym = q.sym AND t.ts >= q.ts "
        "ORDER BY t.sym, t.ts"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["sym", "ts", "size", "px"]], exp, check_dtype=False
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tolerance", [None, 25])
@pytest.mark.parametrize("block_size", [None, 40])
def test_matrix_matches_pandas_merge_asof(
    spark, feeds, direction, exact, tolerance, block_size
):
    ldf, rdf, lp, rp = feeds
    got = _spark_result(
        ldf, rdf, direction=direction, allow_exact_matches=exact,
        tolerance=tolerance, block_size=block_size,
    )
    exp = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="sym",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tolerance,
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["sym", "ts", "size", "px"]], exp[["sym", "ts", "size", "px"]],
        check_dtype=False,
    )


def test_timestamp_on_with_interval_tolerance(spark):
    l = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 12:00:00")],
        "sym string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [("a", "2024-01-01 09:30:00", 1.0), ("a", "2024-01-01 09:45:00", 2.0)],
        "sym string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        l, r, on="ts", by=["sym"], tolerance=F.expr("INTERVAL 1 HOUR")
    ).toPandas().sort_values("ts").reset_index(drop=True)
    # 10:00 matches 09:45 (15 min <= 1h); 12:00's nearest is 2h15m away -> null
    assert out["v"].tolist()[0] == 2.0
    assert pd.isna(out["v"].tolist()[1])


def test_collision_suffix_and_validation(spark, feeds):
    ldf, rdf, *_ = feeds
    # right column named like a left column arrives suffixed
    out = asof_join(ldf, rdf.withColumnRenamed("px", "size"), on="ts", by=["sym"])
    assert "size_right" in out.columns
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, direction="nearest")
    with pytest.raises(ValueError, match="value columns"):
        asof_join(ldf, rdf.select("sym", "ts"), on="ts", by=["sym"])


@pytest.mark.parametrize("block_size", [1, 7, 50, 1000])
def test_range_join_matches_duckdb_inequality_join(spark, feeds, block_size):
    """Same pairs as DuckDB's BETWEEN join at every block size (block_size
    tunes cost, never results)."""
    from mlforecast_spark.joins import range_join

    ldf, rdf, lp, rp = feeds
    windows = ldf.select(
        "sym", F.col("ts").alias("lo"), (F.col("ts") + 20).alias("hi")
    )
    got = (
        range_join(windows, rdf.withColumnRenamed("ts", "qts"), "lo", "hi", "qts",
                   by=["sym"], block_size=block_size)
        .toPandas().sort_values(["sym", "lo", "qts"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("quotes", rp)
    wp = lp.rename(columns={"ts": "lo"}).assign(hi=lambda d: d["lo"] + 20)[
        ["sym", "lo", "hi"]
    ]
    con.register("windows", wp)
    exp = con.execute(
        "SELECT w.sym, w.lo, w.hi, q.ts AS qts, q.px FROM windows w "
        "JOIN quotes q ON w.sym = q.sym AND q.ts BETWEEN w.lo AND w.hi "
        "ORDER BY w.sym, w.lo, qts"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["sym", "lo", "hi", "qts", "px"]], exp, check_dtype=False
    )


def test_range_join_plan_is_equi_not_nested_loop(spark, feeds):
    """The scale contract: the block id gives Spark an equi-key, so the plan
    is a hash/sort-merge join — never BroadcastNestedLoopJoin/cartesian."""
    from mlforecast_spark.joins import range_join

    ldf, rdf, *_ = feeds
    windows = ldf.select("sym", F.col("ts").alias("lo"), (F.col("ts") + 20).alias("hi"))
    out = range_join(windows, rdf.withColumnRenamed("ts", "qts"), "lo", "hi", "qts",
                     by=["sym"], block_size=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:2000]


@pytest.mark.parametrize("block_size", [3, 100, 10**6])
def test_keyless_blocked_asof_equals_single_window(spark, feeds, block_size):
    """block_size is a COST knob, never a results knob: the keyless blocked
    scan (parallel per-time-block + carry stitch) must equal the
    single-partition window at every block size, including one block that
    swallows everything and blocks so small most carry from a predecessor."""
    ldf, rdf, *_ = feeds
    base = asof_join(ldf.drop("sym"), rdf.drop("sym"), on="ts").toPandas()
    blocked = asof_join(
        ldf.drop("sym"), rdf.drop("sym"), on="ts", block_size=block_size
    ).toPandas()
    key = ["ts", "size"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        blocked.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_range_join_self_lineage(spark, feeds):
    """Both sides derived from the SAME frame (the common real-world shape)
    must not trip Spark's ambiguous-self-join check."""
    from mlforecast_spark.joins import range_join

    _, rdf, _, rp = feeds
    w = rdf.select("sym", F.col("ts").alias("lo"), (F.col("ts") + 10).alias("hi"))
    out = range_join(
        w, rdf.withColumnRenamed("ts", "qts"), "lo", "hi", "qts",
        by=["sym"], block_size=10,
    )
    n = out.count()
    exp = sum(
        ((rp["sym"] == s) & (rp["ts"] >= lo) & (rp["ts"] <= lo + 10)).sum()
        for s, lo in zip(rp["sym"], rp["ts"])
    )
    assert n == exp


def test_plan_is_one_window_no_join(spark, feeds):
    """The scale contract: union + running last over ONE window — no join
    node at all, so nothing quadratic can hide in the physical plan."""
    ldf, rdf, *_ = feeds
    plan = (
        asof_join(ldf, rdf, on="ts", by=["sym"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Window") == 1, plan[:2000]
