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


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
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
        asof_join(ldf, rdf, direction="sideways")
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
    base = asof_join(ldf.drop("sym"), rdf.drop("sym"), on="ts", block_size=None).toPandas()
    blocked = asof_join(
        ldf.drop("sym"), rdf.drop("sym"), on="ts", block_size=block_size
    ).toPandas()
    key = ["ts", "size"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        blocked.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_keyless_default_is_blocked_and_parallel(spark, feeds):
    """SAFE BY DEFAULT: a keyless as-of (no ``by``) must not silently funnel
    every row through one window partition. With the default
    block_size='auto' the plan partitions the window by the derived time
    block (many partitions), and the output is bit-identical to the forced
    single-window plan — on a replicated feed large enough that blocking
    matters."""
    ldf, rdf, *_ = feeds
    # replicate the feed 50x with shifted timestamps: one big keyless stream
    reps = spark.range(50).select(F.col("id").alias("rep"))
    big_l = ldf.drop("sym").crossJoin(reps).select(
        (F.col("ts") + F.col("rep") * 500).alias("ts"), "size"
    )
    big_r = rdf.drop("sym").crossJoin(reps).select(
        (F.col("ts") + F.col("rep") * 500).alias("ts"), "px"
    )
    auto = asof_join(big_l, big_r, on="ts")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    # the running-match window is partitioned by the derived block id, not a
    # constant — that is what spreads the scan across tasks
    assert "__asof_b" in plan, plan[:3000]
    single = asof_join(big_l, big_r, on="ts", block_size=None).toPandas()
    got = auto.toPandas()
    key = ["ts", "size"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        single.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("block_size", [None, 3])
def test_null_on_keys_match_pandas_contract(spark, direction, block_size):
    """Null `on` rows: right-side nulls are dropped (never a nearest match),
    left-side nulls pass through with null right columns — on BOTH the
    window and blocked paths (pandas raises instead; this is the documented
    lenient superset)."""
    l = spark.createDataFrame(
        [(None, 1.0), (5, 2.0), (20, 3.0)], "ts long, size double"
    )
    r = spark.createDataFrame(
        [(None, 99.0), (4, 1.5), (10, 2.5)], "ts long, px double"
    )
    out = (
        asof_join(l, r, on="ts", direction=direction, block_size=block_size)
        .toPandas().sort_values("size").reset_index(drop=True)
    )
    assert pd.isna(out.loc[0, "px"])  # null-ts left row: no match
    if direction == "forward":
        assert out["px"].tolist()[1] == 2.5 and pd.isna(out.loc[2, "px"])
    else:  # backward and nearest agree on this fixture
        assert out["px"].tolist()[1:] == [1.5, 2.5]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("block_size", [None, 4])
def test_duplicate_right_ties_match_pandas(spark, direction, block_size):
    """Duplicate right rows at the same (by, on): pandas.merge_asof picks the
    LAST duplicate in input order for backward and the FIRST for forward;
    the seq tiebreaker reproduces that on both paths."""
    lp = pd.DataFrame({"ts": [5, 10]})
    rp = pd.DataFrame({"ts": [3, 3, 7, 7], "v": [1.0, 2.0, 3.0, 4.0]})
    l = spark.createDataFrame(lp).coalesce(1)
    r = spark.createDataFrame(rp).coalesce(1)
    got = (
        asof_join(l, r, on="ts", direction=direction, block_size=block_size)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    exp = pd.merge_asof(lp, rp, on="ts", direction=direction)
    assert got["v"].equals(exp["v"]), (got["v"].tolist(), exp["v"].tolist())


def test_blocked_timestamp_on(spark):
    """block_size works for timestamp `on` columns (microsecond units), so
    the keyless auto default covers time-typed feeds too."""
    l = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 12:00:00",)], "ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [("2024-01-01 09:30:00", 1.0), ("2024-01-01 11:45:00", 2.0)],
        "ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    for bs in ["auto", 3600 * 10**6, None]:
        out = (
            asof_join(l, r, on="ts", block_size=bs)
            .toPandas().sort_values("ts").reset_index(drop=True)
        )
        assert out["v"].tolist() == [1.0, 2.0], bs


def test_range_join_inverted_interval_yields_no_candidates(spark):
    """lo > hi matches nothing AND must not explode a descending block
    sequence (wasted candidates); the guarded explode emits zero blocks."""
    from mlforecast_spark.joins import range_join

    w = spark.createDataFrame(
        [("a", 100, 0), ("a", 0, 10)], "sym string, lo long, hi long"
    )
    r = spark.createDataFrame([("a", 5, 1.0)], "sym string, qts long, v double")
    out = range_join(w, r, "lo", "hi", "qts", by=["sym"], block_size=5)
    rows = out.toPandas()
    assert len(rows) == 1 and rows.loc[0, "lo"] == 0


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


@pytest.mark.parametrize("how", ["left", "left_anti"])
def test_range_join_left_and_anti(spark, how):
    """how='left' keeps unmatched intervals once with null right columns
    (inverted and null-keyed intervals included — the anti pass is
    null-safe); how='left_anti' returns only those."""
    from mlforecast_spark.joins import range_join

    w = spark.createDataFrame(
        [("a", 0, 10), ("a", 50, 60), ("a", 9, 3), (None, 0, 10)],
        "sym string, lo long, hi long",
    )
    r = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 6, 2.0), (None, 7, 9.0)],
        "sym string, qts long, v double",
    )
    out = range_join(w, r, "lo", "hi", "qts", by=["sym"], block_size=5, how=how)
    rows = out.toPandas().sort_values(["lo", "qts"] if how == "left" else ["lo"])
    if how == "left":
        # [0,10] matches qts 5 and 6; null sym window matches the null-sym
        # print (null-safe by key); [50,60] and inverted [9,3] unmatched
        assert len(rows) == 5
        matched = rows[rows.v.notna()]
        assert sorted(matched.v.tolist()) == [1.0, 2.0, 9.0]
        un = rows[rows.v.isna()]
        assert sorted(un.lo.tolist()) == [9, 50]
        assert un.qts.isna().all()
    else:
        assert sorted(rows.lo.tolist()) == [9, 50]
        assert list(rows.columns) == ["sym", "lo", "hi"]


def test_left_on_right_on_and_by_names(spark, feeds):
    """pandas-parity kwargs for differently-named keys: output carries the
    LEFT names, values identical to the shared-name call."""
    ldf, rdf, lp, rp = feeds
    got = asof_join(
        ldf.withColumnRenamed("ts", "trade_ts").withColumnRenamed("sym", "ticker"),
        rdf.withColumnRenamed("ts", "quote_ts"),
        left_on="trade_ts", right_on="quote_ts",
        left_by=["ticker"], right_by=["sym"],
    ).toPandas().sort_values(["ticker", "trade_ts"]).reset_index(drop=True)
    base = asof_join(ldf, rdf, on="ts", by=["sym"]).toPandas().sort_values(
        ["sym", "ts"]
    ).reset_index(drop=True)
    assert list(got.columns) == ["ticker", "trade_ts", "size", "px"]
    assert got["px"].equals(base["px"])
    with pytest.raises(ValueError, match="together"):
        asof_join(ldf, rdf, left_on="ts")
    with pytest.raises(ValueError, match="already has a column"):
        asof_join(
            ldf.withColumnRenamed("ts", "t2"),
            rdf.withColumn("t2", F.lit(0)),
            left_on="t2", right_on="ts",
        )


def test_nearest_plan_is_one_shuffle_two_windows(spark, feeds):
    """The 'one shuffle even for nearest' contract: both directional
    running matches share the partitioning, so the plan carries exactly
    ONE hash exchange, two Window nodes, and no join."""
    import re

    ldf, rdf, *_ = feeds
    plan = (
        asof_join(ldf, rdf, on="ts", by=["sym"], direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Window") == 2, plan[:2000]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]


def test_keyless_auto_spreads_skewed_feed(spark):
    """Equi-depth auto blocking: a feed with 99% of rows in 1% of the time
    range must still spread across many blocks (fixed-width blocks would
    pile the mass into one id), and results must equal the single window."""
    import pandas as pd

    n = 4000
    # heavy cluster in [0, 100), sparse tail out to 1e9
    l = spark.range(n).select(
        F.when(F.col("id") < n - 40, F.col("id") % 100)
        .otherwise((F.col("id") - (n - 40)) * 25_000_000)
        .cast("long").alias("ts"),
        F.col("id").cast("double").alias("size"),
    )
    r = l.select((F.col("ts") - 1).alias("ts"), (F.col("size") * 2).alias("px"))
    auto = asof_join(l, r, on="ts")
    # blocks actually used by the mass: count distinct bins over the plan's
    # block column by re-deriving it the same way the join does
    from mlforecast_spark.joins import _block_expr, _derive_block_bins

    bins = _derive_block_bins(l, r.filter(F.col("ts").isNotNull()), "ts",
                              _block_expr("ts", "bigint"))
    n_used = l.select(bins.alias("b")).distinct().count()
    assert n_used >= 32, n_used  # fixed-width over [0, 1e9] would give ~1-2
    single = asof_join(l, r, on="ts", block_size=None).toPandas()
    got = auto.toPandas()
    key = ["ts", "size"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        single.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_filter_on_match_column_after_auto_blocked_join(spark, feeds, direction):
    """Regression: with the equi-depth auto bin as a raw group key, a
    downstream IS NOT NULL filter on a match column made Spark's
    InferFiltersFromConstraints manufacture a predicate referencing `on`
    and push it into the post-aggregation spine —
    [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] at execution. The shuffle()
    barrier in _derive_block_bins pins the fix; counts must also equal the
    single-window plan's."""
    ldf, rdf, *_ = feeds
    auto = asof_join(
        ldf.drop("sym"), rdf.drop("sym"), on="ts", direction=direction
    )
    n_auto = auto.filter(F.col("px").isNotNull()).count()
    single = asof_join(
        ldf.drop("sym"), rdf.drop("sym"), on="ts", direction=direction,
        block_size=None,
    )
    assert n_auto == single.filter(F.col("px").isNotNull()).count()


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_explicit_tiebreak_column_beats_scan_order(spark, direction):
    """tiebreak='seq': among right duplicates at the same (by, on) the
    LARGEST seq wins for backward and the SMALLEST for forward, regardless
    of the right side's scan/partition order (here deliberately reversed
    and split across partitions)."""
    lp = pd.DataFrame({"ts": [5, 10]})
    # seq deliberately DESCENDING in input order, spread over 4 partitions
    rp = pd.DataFrame(
        {"ts": [3, 3, 7, 7], "seq": [2, 1, 9, 4], "v": [20.0, 10.0, 90.0, 40.0]}
    )
    l = spark.createDataFrame(lp)
    r = spark.createDataFrame(rp).repartition(4)
    got = (
        asof_join(l, r, on="ts", direction=direction, tiebreak="seq")
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    if direction == "backward":
        assert got["v"].tolist() == [20.0, 90.0]  # max-seq duplicate wins
    else:
        # ts=5 -> first-at-or-after is ts=7, min-seq duplicate (seq 4) wins;
        # ts=10 has no right row at-or-after -> null
        assert got["v"].tolist()[0] == 40.0
        assert pd.isna(got["v"].tolist()[1])

    # blocked path must agree with the window path
    got_b = (
        asof_join(l, r, on="ts", direction=direction, tiebreak="seq", block_size=4)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert got_b["v"].equals(got["v"]), (got_b["v"].tolist(), got["v"].tolist())

    with pytest.raises(ValueError, match="not in right side"):
        asof_join(l, r, on="ts", tiebreak="nope")
    with pytest.raises(ValueError, match="join key"):
        asof_join(l, r, on="ts", tiebreak="ts")


def test_precomputed_bins_block_size(spark, feeds):
    """block_size=<boundary list from derive_asof_bins> equals both the
    'auto' and single-window plans — the streaming enrich path's reuse
    contract (bins affect parallelism, never results)."""
    from mlforecast_spark.joins import derive_asof_bins

    ldf, rdf, *_ = feeds
    l, r = ldf.drop("sym"), rdf.drop("sym")
    bins = derive_asof_bins(r, "ts")
    assert len(bins) >= 2 and bins == sorted(bins)
    got = asof_join(l, r, on="ts", block_size=bins).toPandas()
    exp = asof_join(l, r, on="ts", block_size=None).toPandas()
    key = ["ts", "size"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    # degenerate boundary lists fall back to the single-window plan
    one = asof_join(l, r, on="ts", block_size=[1.0]).toPandas()
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
