"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises the mlforecast_spark engine (FeaturePlan /
target transforms / operators) on a TPC-H-derived panel (FIXTURES.md F7) or
the documents/embeddings tables; ``oracle_sql()`` holds the equivalent ANSI
SQL for DuckDB. Frame semantics follow the reference's SQL oracle
(`/root/reference/tests/test_pooled_sqlite_oracle.py:24-213`).

All float outputs are rounded to 6 decimals on BOTH sides so the driver's
value-hash comparison is robust to engine-level FP accumulation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.utils import qcol

# ---------------------------------------------------------------------------
# shared panel builders (Spark + SQL must be semantically identical)
# ---------------------------------------------------------------------------

# daily order revenue per nation (25 series), statics: region name
PANEL_SQL = (
    "panel AS ("
    " SELECT n_name AS unique_id, CAST(o_orderdate AS DATE) AS ds,"
    "        ROUND(SUM(o_totalprice), 2) AS y"
    " FROM orders, customer, nation"
    " WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey"
    " GROUP BY 1, 2)"
)

PANEL_REGION_SQL = (
    "panel AS ("
    " SELECT n_name AS unique_id, r_name AS region, CAST(o_orderdate AS DATE) AS ds,"
    "        ROUND(SUM(o_totalprice), 2) AS y"
    " FROM orders, customer, nation, region"
    " WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey"
    "   AND n_regionkey = r_regionkey"
    " GROUP BY 1, 2, 3)"
)


# Memoized parquet readers: spark.read.parquet re-reads file footers on the
# DRIVER at every call (~0.1-0.25 s per query at bench SF — pure plan-build
# latency, no executor work). The returned DataFrame is an immutable logical
# plan, safe to reuse across queries within a session.
_READ_CACHE: dict = {}


def _read(spark: SparkSession, path: str) -> DataFrame:
    key = (id(spark), path)
    df = _READ_CACHE.get(key)
    if df is None:
        df = _READ_CACHE[key] = spark.read.parquet(path)
    return df


_FATNESS_CACHE: dict = {}


def _panel_rows_per_group(sf_dir: str) -> float:
    """Driver-only, footer-only estimate of orders rows per (nation, day)
    panel group: parquet row counts plus the o_orderdate min/max column
    statistics — no Spark job, no data pages read. Memoized per directory
    (the footers are immutable test fixtures). Returns -1.0 when the
    footers carry no usable stats: UNKNOWN fatness keeps the raw-row
    repartition plan (the measured-right default at every driver SF)."""
    est = _FATNESS_CACHE.get(sf_dir)
    if est is None:
        try:
            import pyarrow.parquet as pq

            omd = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata
            names = {
                omd.schema.column(i).name: i for i in range(omd.num_columns)
            }
            ci = names["o_orderdate"]
            mn = mx = None
            for rg in range(omd.num_row_groups):
                st = omd.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no o_orderdate min/max stats")
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            days = max(1.0, (mx - mn).total_seconds() / 86400.0 + 1.0)
            nations = pq.ParquetFile(f"{sf_dir}/nation.parquet").metadata.num_rows
            est = omd.num_rows / max(1.0, days * nations)
        except Exception:
            est = -1.0
        _FATNESS_CACHE[sf_dir] = est
    return est


def _fat_groups(spark: SparkSession, sf_dir: str) -> bool:
    """r12 gate for the r11 id-keyed RAW-row panel exchange (guide §2.3,
    'aggregate before you shuffle'). The raw repartition trades map-side
    partial aggregation away for exchange reuse — right when ingest rows
    reduce only ~2-3x into panel rows (every driver SF measures ~2.5
    orders per (nation, day)), silently wrong when (id, ds) groups are
    fat: a workload with hundreds of raw rows per group would shuffle
    hundreds of times more bytes than the partially-aggregated form. Same
    measured-threshold pattern as spreadScan.minBytes /
    groupFingerprints.minBytes: estimate rows-per-group from parquet
    footers alone and fall back to aggregate-then-shuffle above the
    threshold (default 32; synthetic A/B at 256 and 1024 rows/group over
    6.1M raw rows measured the partial-agg plan 1.33x faster end-to-end
    through a rolling-mean consumer, y bit-identical — OPTIMIZATION_r12.md).
    Set spark.mlforecast.panel.rawRepartitionMaxRowsPerGroup=-1 to pin
    the raw plan unconditionally."""
    max_rpg = float(
        spark.conf.get(
            "spark.mlforecast.panel.rawRepartitionMaxRowsPerGroup", "32"
        )
    )
    if max_rpg < 0:
        return False
    est = _panel_rows_per_group(sf_dir)
    return est > max_rpg


def _panel(spark: SparkSession, sf_dir: str, with_region: bool = False) -> DataFrame:
    orders = _read(spark, f"{sf_dir}/orders.parquet")
    customer = _read(spark, f"{sf_dir}/customer.parquet")
    nation = _read(spark, f"{sf_dir}/nation.parquet")
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    keys = [F.col("n_name").alias("unique_id")]
    if with_region:
        region = _read(spark, f"{sf_dir}/region.parquet")
        joined = joined.join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        )
        keys.append(F.col("r_name").alias("region"))
    # r11: key the aggregation exchange by the SERIES id alone (hash(id)
    # still clusters every (id, ds) group), so the per-id window pass every
    # feature query runs next reuses this exchange instead of re-shuffling
    # the whole panel (optimization guide §2.4: establish the partitioning
    # once). Measured: every windowed consumer plans one fewer Exchange
    # (4 -> 3 on rolling_mean); y values verified bit-identical at
    # sf0.001/0.01/0.1/1 (exact double comparison, 0 mismatches) — the
    # group sums land in one task each, same rounding class as before.
    # The date cast runs BEFORE the exchange (guide §2.3, narrower types):
    # the group key is to_date(o_orderdate) either way, so shuffling the
    # 4-byte date instead of the 8-byte timestamp is value-identical and
    # drops ~13% of the panel exchange's raw row width.
    #
    # r12: the raw-row repartition is now GATED on group fatness (see
    # _fat_groups). Fat (id, ds) groups take the aggregate-then-shuffle
    # plan: partial aggregation collapses the fat groups map-side, the
    # exchange carries panel rows instead of raw rows, and a cheap
    # repartition of the AGGREGATED frame (one row per (id, ds)) restores
    # the id-clustering every downstream window pass reuses.
    joined = joined.withColumn("_panel_ds", F.to_date("o_orderdate"))
    if _fat_groups(spark, sf_dir):
        return joined.groupBy(
            *keys, F.col("_panel_ds").alias("ds")
        ).agg(F.round(F.sum("o_totalprice"), 2).alias("y")).repartition(
            F.col("unique_id")
        )
    return joined.repartition(F.col("n_name")).groupBy(
        *keys, F.col("_panel_ds").alias("ds")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("y"))


def _count_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ORDER COUNT per nation: integer-valued target, so every group
    sum in the GBT oracle is fp-exact (< 2^53) and hash-safe."""
    orders = _read(spark, f"{sf_dir}/orders.parquet")
    customer = _read(spark, f"{sf_dir}/customer.parquet")
    nation = _read(spark, f"{sf_dir}/nation.parquet")
    base = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        # same id-keyed exchange as _panel (guide §2.4); COUNT is
        # order-invariant, so this one is trivially value-safe. Date cast
        # pre-exchange as in _panel (guide §2.3). Same r12 fatness gate as
        # _panel: fat groups aggregate before the shuffle.
        .withColumn("_panel_ds", F.to_date("o_orderdate"))
    )
    if _fat_groups(spark, sf_dir):
        return (
            base.groupBy(
                F.col("n_name").alias("unique_id"), F.col("_panel_ds").alias("ds")
            )
            .agg(F.count(F.lit(1)).cast("double").alias("y"))
            .repartition(F.col("unique_id"))
        )
    return (
        base.repartition(F.col("n_name"))
        .groupBy(F.col("n_name").alias("unique_id"), F.col("_panel_ds").alias("ds"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, f"{sf_dir}/embeddings.parquet")


# Quantized panel for unbounded-window queries: y snapped to multiples of 16
# makes every window SUM an exact integer (< 2^53), so Spark's and DuckDB's
# different summation-tree associations produce bit-identical results and the
# driver's value-hash comparison cannot be broken by last-ulp drift.
QUANT_SQL = "ROUND(y / 16) * 16"


def _quantize(panel: DataFrame) -> DataFrame:
    return panel.withColumn("y", F.round(F.col("y") / 16) * 16)


def _round6_repr(expr: str) -> str:
    """DuckDB ROUND that reproduces Spark's round() semantics exactly.

    Spark rounds DOUBLE via BigDecimal.valueOf — HALF_UP on the SHORTEST
    round-trip decimal repr — while DuckDB's ROUND works off the exact
    binary value; they disagree when the shortest repr is a tie at the 7th
    digit but the exact double is not (r10 caught one in the quantized ewm
    slot: raw 265180.56591449998 has shortest repr "265180.5659145" →
    Spark ...915, DuckDB ...914). CAST(v AS VARCHAR) produces the shortest
    repr, DECIMAL(38,18) holds it exactly for |v| < 1e20, and DuckDB's
    decimal ROUND is half-away-from-zero = BigDecimal HALF_UP."""
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,18)), 6)"
        " AS DOUBLE)"
    )


# fixed retrieval query for the BM25 leg of the doc_text_profile slot
_BM25_TERMS = ["spark", "window", "vector"]


def _text_profile_plain_sql() -> str:
    """The r01-r06 doc_text_profile oracle SQL (token stats + language ID +
    fingerprint, no BM25) — also pinned by tools/bench_oracle.py so the
    bench line stays comparable across rounds."""
    from mlforecast_spark.operators.text import LANG_MARKERS

    # language scores: same token-equality counting as operators/text.py
    # (one tokenize pass; a token scores iff it equals a marker word)
    score_exprs = []
    for lang, words in LANG_MARKERS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        score_exprs.append(
            f"CAST(len(list_filter(toks, t -> t IN ({in_list})))"
            f" AS INTEGER) AS score_{lang}"
        )
    langs = list(LANG_MARKERS)
    guess = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        guess = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {guess} END"
        best = f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
    li_score_cols = ", ".join(f"li.score_{lang}" for lang in langs)

    return (
        "WITH tbase AS (SELECT doc_id, text, LENGTH(text) AS n_chars,"
        " CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0"
        "  ELSE len(string_split_regex(TRIM(text), '\\s+')) END AS n_tokens,"
        " LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS n_punct,"
        " LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces"
        " FROM documents),"
        " ts AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,"
        "  CAST(n_tokens AS BIGINT) AS n_tokens,"
        "  ROUND(CASE WHEN n_tokens > 0 THEN (n_chars - n_spaces) * 1.0 / n_tokens ELSE 0.0 END, 6) AS avg_token_len,"
        "  ROUND(CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END, 6) AS punct_ratio,"
        "  ROUND(CASE WHEN n_chars > 0 THEN n_spaces * 1.0 / n_chars ELSE 0.0 END, 6) AS space_ratio"
        " FROM tbase),"
        " lbase AS (SELECT doc_id,"
        "  regexp_split_to_array(LOWER(text), '\\s+') AS toks FROM documents),"
        f" li AS (SELECT doc_id, {', '.join(score_exprs)} FROM lbase),"
        f" li2 AS (SELECT *, CASE WHEN {best} > 0 THEN {guess} ELSE 'unknown' END AS lang_guess FROM li),"
        " fp AS (SELECT doc_id, md5(array_to_string("
        "  regexp_extract_all(LOWER(text), '[a-z0-9]+'), ' ')) AS fingerprint"
        "  FROM documents)"
        " SELECT ts.doc_id, ts.n_chars, ts.n_tokens, ts.avg_token_len,"
        f"  ts.punct_ratio, ts.space_ratio, {li_score_cols.replace('li.', 'li2.')},"
        "  li2.lang_guess, fp.fingerprint"
        " FROM ts JOIN li2 ON ts.doc_id = li2.doc_id"
        " JOIN fp ON ts.doc_id = fp.doc_id"
    )


def _text_profile_bm25_sql() -> str:
    """doc_text_profile merged slot: the plain profile columns PLUS Okapi
    BM25 (Lucene idf, k1=1.2, b=0.75) for the fixed ``_BM25_TERMS`` query —
    the exact formula of operators/text.py::bm25_scores, rounded to 6 dp
    under the hash gate."""
    terms_in = ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS))
    return (
        "WITH prof AS (" + _text_profile_plain_sql() + "),"
        " bmtok AS (SELECT doc_id, unnest(string_split_regex("
        "  TRIM(LOWER(text)), '\\s+')) AS tok FROM documents),"
        " bmtok2 AS (SELECT doc_id, tok FROM bmtok WHERE tok <> ''),"
        " bmdl AS (SELECT doc_id, COUNT(*) AS dl FROM bmtok2 GROUP BY doc_id),"
        " bmstats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM bmdl),"
        f" bmtf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM bmtok2"
        f"  WHERE tok IN ({terms_in}) GROUP BY doc_id, tok),"
        " bmdf AS (SELECT tok, COUNT(*) AS dfq FROM bmtf GROUP BY tok),"
        " bmscored AS (SELECT t.doc_id,"
        "  SUM(LN(1.0 + (s.n - d.dfq + 0.5) / (d.dfq + 0.5))"
        "   * (t.tf * (1.2 + 1.0))"
        "   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS bm25raw"
        "  FROM bmtf t JOIN bmdf d USING (tok) JOIN bmdl l USING (doc_id)"
        "  CROSS JOIN bmstats s GROUP BY t.doc_id)"
        " SELECT prof.*, ROUND(COALESCE(b.bm25raw, 0.0), 6) AS bm25"
        " FROM prof LEFT JOIN bmscored b USING (doc_id)"
    )


def _text_profile_quality_sql() -> str:
    """doc_text_profile merged slot, round-8 extension: the bm25-profile
    columns PLUS the Gopher quality gate of
    operators/text.py::quality_filter — repetition signals (type/token,
    top-token share, duplicate-bigram fraction), the ordered drop_reasons
    list (comma-joined) and the keep flag, all at default thresholds.
    Rules apply to the 6-dp-rounded stats on both engines, so the hash
    gate covers the gate's formula end-to-end."""
    rules = [
        ("too_few_tokens", "p.n_tokens < 20"),
        ("too_many_tokens", "p.n_tokens > 200000"),
        ("punct_heavy", "p.punct_ratio > 0.25"),
        ("tokens_too_short", "p.avg_token_len < 2.0"),
        ("tokens_too_long", "p.avg_token_len > 12.0"),
        ("repetitive_vocab", "r.type_token_ratio < 0.15"),
        ("repetitive_bigrams", "r.dup_bigram_frac > 0.4"),
    ]
    cases = ", ".join(f"CASE WHEN {cond} THEN '{name}' END" for name, cond in rules)
    return (
        "WITH prof AS (" + _text_profile_bm25_sql() + "),"
        " qlb AS (SELECT doc_id, list_filter(string_split_regex(lower(text),"
        "  '\\s+'), t -> t <> '') AS toks FROM documents),"
        " qlb2 AS (SELECT doc_id, toks, list_transform(toks[1:len(toks)-1],"
        "  (x, i) -> x || ' ' || toks[i+1]) AS bgs FROM qlb),"
        " qtok AS (SELECT doc_id, unnest(toks) AS tok FROM qlb2),"
        " qbg AS (SELECT doc_id, unnest(bgs) AS bg FROM qlb2),"
        " qtc AS (SELECT doc_id, tok, COUNT(*) AS c FROM qtok GROUP BY 1, 2),"
        " qts AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_types,"
        "  MAX(c) AS topc FROM qtc GROUP BY 1),"
        " qbc AS (SELECT doc_id, bg, COUNT(*) AS c FROM qbg GROUP BY 1, 2),"
        " qbs AS (SELECT doc_id, SUM(c) AS nbg, COUNT(*) AS dbg FROM qbc GROUP BY 1),"
        " qrep AS (SELECT d.doc_id,"
        "  ROUND(CASE WHEN t.n > 0 THEN t.n_types * 1.0 / t.n ELSE 0.0 END, 6)"
        "   AS type_token_ratio,"
        "  ROUND(CASE WHEN t.n > 0 THEN t.topc * 1.0 / t.n ELSE 0.0 END, 6)"
        "   AS top_token_frac,"
        "  ROUND(CASE WHEN b.nbg > 0 THEN (b.nbg - b.dbg) * 1.0 / b.nbg ELSE 0.0 END, 6)"
        "   AS dup_bigram_frac"
        "  FROM documents d LEFT JOIN qts t USING (doc_id)"
        "  LEFT JOIN qbs b USING (doc_id)),"
        f" qgate AS (SELECT p.doc_id, r.type_token_ratio, r.top_token_frac,"
        f"  r.dup_bigram_frac, list_filter([{cases}], x -> x IS NOT NULL) AS reasons"
        "  FROM prof p JOIN qrep r USING (doc_id))"
        " SELECT p.*, g.type_token_ratio, g.top_token_frac, g.dup_bigram_frac,"
        "  COALESCE(array_to_string(g.reasons, ','), '') AS drop_reasons,"
        "  len(g.reasons) = 0 AS keep"
        " FROM prof p JOIN qgate g USING (doc_id)"
    )


def _feature_query(transform_factory, out_name: str, with_region: bool = False, extra_cols=None, quantize: bool = False, broadcast_join_back=None, plan_cse_y: bool = False):
    """Query = panel -> FeaturePlan with one transform -> (unique_id, ds, feature).

    ``broadcast_join_back=True`` is the caller's assertion that the pooled
    bucket keys are tiny (here: TPC-H region names / a weekend flag), so the
    collapsed feature frame broadcasts instead of sort-merge-joining the
    whole panel.

    ``plan_cse_y=True`` adds ``abs(y * 0.0)`` (identically +0.0 on this
    panel's finite y) to the output expression — manual common-subexpression
    elimination: a pooled plan references the panel on BOTH join-back sides,
    and without a consumer for ``y`` on the probe side, column pruning makes
    the two panel-aggregation subtrees differ so Spark cannot reuse the
    exchange and builds the panel twice (scan + dim joins + shuffle, twice).
    Consuming y makes the subtrees canonically identical -> AQE stage reuse
    builds the panel ONCE (measured: one fewer job, one fewer orders scan;
    values bit-identical since the addend is +0.0 and NULL propagates)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        panel = _panel(spark, sf_dir, with_region=with_region)
        if quantize:
            panel = _quantize(panel)
        if extra_cols:
            for name, expr in extra_cols.items():
                panel = panel.withColumn(name, expr)
        lag, tfm = transform_factory()
        registry = _parse_transforms([], {lag: [tfm]})
        plan = FeaturePlan(schema=PanelSchema(), registry=registry,
                           join_back_broadcast=broadcast_join_back)
        feats = plan.apply(panel)
        fname = next(iter(registry))
        out = F.round(qcol(fname), 6)
        if plan_cse_y:
            out = out + F.abs(F.col("y") * F.lit(0.0))
        return feats.select("unique_id", "ds", out.alias(out_name))

    return q


def _multi_feature_query(transforms_factory, out_names, with_region: bool = False, extra_cols=None, quantize: bool = False, broadcast_join_back=None):
    """Query = panel -> FeaturePlan with several transforms -> one row per
    (unique_id, ds) with one column per transform. Merged variants keep every
    operator under the driver's value-hash gate while spending a single
    ``queries()`` slot (the driver checks only the first 50 entries)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        panel = _panel(spark, sf_dir, with_region=with_region)
        if quantize:
            panel = _quantize(panel)
        if extra_cols:
            for name, expr in extra_cols.items():
                panel = panel.withColumn(name, expr)
        registry = _parse_transforms([], transforms_factory())
        plan = FeaturePlan(schema=PanelSchema(), registry=registry,
                           join_back_broadcast=broadcast_join_back)
        feats = plan.apply(panel)
        fnames = list(registry)
        return feats.select(
            "unique_id",
            "ds",
            *[
                F.round(qcol(fn), 6).alias(out)
                for fn, out in zip(fnames, out_names)
            ],
        )

    return q


# oracle SQL templates (local mode: ROWS frames, gap-free-irrelevant because
# both engines window over the same observed rows ordered by ds)

def _rolling_sql(agg_expr: str, result: str, lag: int, ws: int, ms: int, out: str) -> str:
    lower, upper = lag + ws - 1, lag
    return (
        f"WITH {PANEL_SQL}, aggs AS ("
        f" SELECT unique_id, ds, {agg_expr} FROM panel"
        f" WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        f"  ROWS BETWEEN {lower} PRECEDING AND {upper} PRECEDING))"
        f" SELECT unique_id, ds, ROUND({result.format(ms=ms)}, 6) AS {out} FROM aggs"
    )


def _expanding_sql(agg_expr: str, result: str, lag: int, out: str, quant: bool = False) -> str:
    source = "panel"
    ctes = f"WITH {PANEL_SQL}"
    if quant:
        ctes += f", qpanel AS (SELECT unique_id, ds, {QUANT_SQL} AS y FROM panel)"
        source = "qpanel"
    return (
        f"{ctes}, aggs AS ("
        f" SELECT unique_id, ds, {agg_expr} FROM {source}"
        f" WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND {lag} PRECEDING))"
        f" SELECT unique_id, ds, ROUND({result}, 6) AS {out} FROM aggs"
    )


_MEAN_AGG = "SUM(y) OVER w AS w_sum, COUNT(y) OVER w AS w_cnt"
_MEAN_RES = "CASE WHEN w_cnt >= {ms} AND w_cnt > 0 THEN w_sum * 1.0 / w_cnt END"
_MIN_RES = "CASE WHEN w_cnt >= {ms} AND w_cnt > 0 THEN w_min END"
_MAX_AGG = "MAX(y) OVER w AS w_max, COUNT(y) OVER w AS w_cnt"
_MAX_RES = "CASE WHEN w_cnt >= {ms} AND w_cnt > 0 THEN w_max END"
_Q_AGG = "quantile_cont(y, {p}) OVER w AS w_q, COUNT(y) OVER w AS w_cnt"
_Q_RES = "CASE WHEN w_cnt >= {ms} AND w_cnt > 0 THEN w_q END"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: fit + recursive 7-day forecast of nation revenue."""
    from mlforecast_spark import MLForecast
    from mlforecast_spark.lag_transforms import ExpandingMean, RollingMean
    from mlforecast_spark.models import LinearRegression

    panel = _panel(spark, "/root/testdata/sf0.001")
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7, min_samples=1), ExpandingMean()]},
        date_features=["dayofweek"],
    )
    mf.fit(panel)
    return mf.predict(7)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mlforecast_spark.lag_transforms import (
        Combine,
        ExpandingMax,
        ExpandingMean,
        ExpandingMin,
        ExpandingQuantile,
        ExpandingStd,
        ExponentiallyWeightedMean,
        Lag,
        LookupLag,
        Offset,
        RollingMax,
        RollingMean,
        RollingMin,
        RollingQuantile,
        RollingStd,
        SeasonalRollingMean,
    )
    import operator as _op

    q: dict[str, Callable] = {}

    # --- relational / pipeline plumbing --------------------------------
    q["panel_build"] = lambda spark, sf: _panel(spark, sf).select(
        "unique_id", "ds", "y"
    )

    def validation_stats(spark, sf):
        from mlforecast_spark.data_validation import series_stats

        return series_stats(_panel(spark, sf), freq="D")

    q["validation_stats"] = validation_stats

    def future_grid_q(spark, sf):
        """Merged slot (r9): the dense per-series calendar from
        ``preprocessing.fill_gaps`` (gap rows carry NULL y) unioned with
        the 7-step future grid — one oracle row covering both calendar
        operators (generate_series min..max+7 LEFT JOIN panel in DuckDB)."""
        from mlforecast_spark.preprocessing import fill_gaps
        from mlforecast_spark.utils import future_grid

        panel = _panel(spark, sf)
        filled = fill_gaps(panel, "D", start="per_serie", end="per_serie")
        future = future_grid(panel, "D", 7).withColumn(
            "y", F.lit(None).cast("double")
        )
        return filled.unionByName(future)

    q["fill_gaps_future_grid"] = future_grid_q

    def keep_last_n(spark, sf):
        from pyspark.sql import Window

        panel = _panel(spark, sf)
        w = Window.partitionBy("unique_id").orderBy(F.col("ds").desc())
        return (
            panel.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 28)
            .select("unique_id", "ds", "y")
        )

    q["keep_last_n"] = keep_last_n

    def expand_target(spark, sf):
        from pyspark.sql import Window

        panel = _panel(spark, sf)
        w = Window.partitionBy("unique_id").orderBy("ds")
        return panel.select(
            "unique_id",
            "ds",
            F.lead("y", 1).over(w).alias("y_lead1"),
            F.lead("y", 2).over(w).alias("y_lead2"),
        )

    q["expand_target_leads"] = expand_target

    # --- local lag transforms ------------------------------------------
    # merged slot: plain Lag(7) + dow-partitioned LookupLag in one query
    q["lag7"] = _multi_feature_query(
        lambda: {7: [Lag(7)], 1: [LookupLag(partition_by=["dow"])]},
        ["lag7_val", "ll"],
        extra_cols={"dow": (F.dayofweek("ds") + 5) % 7},
    )
    q["rolling_mean"] = _feature_query(
        lambda: (1, RollingMean(window_size=7)), "rm"
    )
    # merged variants: one queries() slot each covers 4 (resp. 2) rolling /
    # expanding operators under the 50-row oracle window
    # quantize: the r9 sf1 STRICT sweep caught 2 rows flipping a round(6)
    # boundary from summation-tree reassociation in the windowed std; the
    # /16 grid makes the window sums exact integers (same fix as the pooled
    # family), so both engines agree bit-for-bit at every SF
    q["rolling_std_quantile"] = _multi_feature_query(
        lambda: {
            1: [
                RollingStd(window_size=7),
                RollingQuantile(p=0.5, window_size=7),
                RollingMin(window_size=7),
                RollingMax(window_size=7),
            ]
        },
        ["rs", "rq", "rmin", "rmax"],
        quantize=True,
    )
    q["expanding_mean"] = _multi_feature_query(
        lambda: {1: [ExpandingMean(), ExpandingStd()]}, ["em", "es"], quantize=True
    )
    q["expanding_min_max"] = _multi_feature_query(
        lambda: {1: [ExpandingMin(), ExpandingMax()]}, ["emin", "emax"]
    )
    q["expanding_quantile"] = _feature_query(
        lambda: (1, ExpandingQuantile(p=0.25)), "eq"
    )

    def seasonal_mean_std_q(spark, sf):
        from mlforecast_spark.lag_transforms import SeasonalRollingStd

        return _multi_feature_query(
            lambda: {
                1: [
                    SeasonalRollingMean(season_length=7, window_size=4, min_samples=1),
                    SeasonalRollingStd(season_length=7, window_size=4, min_samples=2),
                ]
            },
            ["srm", "srs"],
            quantize=True,
        )(spark, sf)

    q["seasonal_rolling_mean_std"] = seasonal_mean_std_q
    q["ewm"] = _feature_query(
        lambda: (1, ExponentiallyWeightedMean(alpha=0.3)), "ewm_val", quantize=True
    )
    q["rolling_mean_min_samples"] = _feature_query(
        lambda: (2, RollingMean(window_size=14, min_samples=3)), "rmms"
    )
    q["offset_rolling_mean"] = _feature_query(
        lambda: (1, Offset(RollingMean(window_size=7), 2)), "orm"
    )
    def pges_q(spark, sf):
        """Pooled-global expanding std over the per-timestamp collapsed
        panel. Input is quantized to INTEGERS (``round(y/4096)``, no
        scale-back): the collapsed values' squares then sum exactly in
        float64 (everything stays below 2^53), so both engines produce
        bit-identical stds REGARDLESS of summation order — the
        ``round(y/16)*16`` grid used elsewhere still left sum(y^2) at
        ~8e18 where per-engine reassociation flipped ~24 round(6)
        boundaries at sf0.1."""
        panel = _panel(spark, sf).withColumn("y", F.round(F.col("y") / 4096))
        registry = _parse_transforms(
            [], {1: [ExpandingStd(global_=True, time_agg="sum")]}
        )
        plan = FeaturePlan(schema=PanelSchema(), registry=registry)
        fname = next(iter(registry))
        # same plan-CSE as _feature_query(plan_cse_y=True): consume y so the
        # two join-back panel subtrees dedupe into one exchange
        return plan.apply(panel).select(
            "unique_id",
            "ds",
            (F.round(qcol(fname), 6) + F.abs(F.col("y") * F.lit(0.0))).alias("pges"),
        )

    q["pooled_global_expanding_std"] = pges_q
    q["combine_ratio"] = _feature_query(
        lambda: (
            1,
            Combine(
                RollingMean(window_size=7, min_samples=1),
                RollingMean(window_size=28, min_samples=1),
                _op.truediv,
            ),
        ),
        "ratio",
    )

    # --- pooled transforms ---------------------------------------------
    # quantized input on every pooled query whose plan sums doubles across
    # series (collapse SUM/AVG) or across calendar partitions: the /16 grid
    # makes those sums exact in float64, so per-engine summation-tree
    # reassociation cannot flip a round(6) boundary — the flake class
    # observed once on pooled_groupby_ewm at sf0.1
    q["pooled_global_rolling_mean"] = _feature_query(
        lambda: (1, RollingMean(window_size=7, global_=True, time_agg="sum")),
        "pgrm",
        quantize=True,
        plan_cse_y=True,
    )
    q["pooled_groupby_expanding_mean"] = _feature_query(
        lambda: (1, ExpandingMean(groupby=["region"])),
        "pgem",
        with_region=True,
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )
    q["pooled_partition_rolling_mean"] = _feature_query(
        lambda: (1, RollingMean(window_size=7, partition_by=["is_weekend"])),
        "pprm",
        extra_cols={"is_weekend": ((F.dayofweek("ds") + 5) % 7 >= 5).cast("int")},
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )
    q["pooled_groupby_timeagg_rolling_mean"] = _feature_query(
        lambda: (1, RollingMean(window_size=7, groupby=["region"], time_agg="mean")),
        "pgtrm",
        with_region=True,
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )
    q["pooled_seasonal_rolling_mean"] = _feature_query(
        lambda: (
            7,
            SeasonalRollingMean(
                season_length=7, window_size=4, global_=True, time_agg="sum"
            ),
        ),
        "psrm",
        quantize=True,
        plan_cse_y=True,
    )
    q["pooled_groupby_seasonal_rolling_mean"] = _feature_query(
        lambda: (
            7,
            SeasonalRollingMean(season_length=7, window_size=2, groupby=["region"]),
        ),
        "pgsrm",
        with_region=True,
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )
    q["pooled_partition_expanding_mean"] = _feature_query(
        lambda: (1, ExpandingMean(partition_by=["is_weekend"])),
        "ppem",
        extra_cols={"is_weekend": ((F.dayofweek("ds") + 5) % 7 >= 5).cast("int")},
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )
    # quantized input: the per-(region, ord) collapse AVG and the EWM
    # recursion compound float reassociation across engines/partitionings —
    # observed ONE round(6) boundary flip at sf0.1 in an otherwise-green
    # session; the /16 grid makes the collapse sums exact (same fix as the
    # other pooled means)
    q["pooled_groupby_ewm"] = _feature_query(
        lambda: (1, ExponentiallyWeightedMean(alpha=0.4, groupby=["region"])),
        "pgewm",
        with_region=True,
        quantize=True,
        broadcast_join_back=True,
        plan_cse_y=True,
    )

    # --- date features (string family + dummy expansion, one slot) ------
    # r9 merge: the slot also carries the deterministic positional
    # regressors (feature_engineering.fourier/trend via pipeline — one
    # row_number window), so their values are oracle-checked too
    def date_feats_all(spark, sf):
        from mlforecast_spark.date_features import apply_date_features, date_feature_col
        from mlforecast_spark.feature_engineering import fourier, pipeline, trend

        panel = _panel(spark, sf)
        det, _ = pipeline(
            panel, [(fourier, {"season_length": 7, "k": 1}), trend], "D"
        )
        out, names = apply_date_features(det, "ds", ["dayofweek"], as_dummies=True)
        ds = F.col("ds")
        return out.select(
            "unique_id",
            "ds",
            date_feature_col("dayofweek", ds).alias("dayofweek"),
            date_feature_col("month", ds).alias("month"),
            date_feature_col("quarter", ds).alias("quarter"),
            date_feature_col("dayofyear", ds).alias("dayofyear"),
            date_feature_col("is_month_end", ds).alias("is_month_end"),
            date_feature_col("daysinmonth", ds).alias("daysinmonth"),
            *names,
            # `+ 0.0` normalizes IEEE signed zero: Spark folds 2*pi/7 in
            # Python while DuckDB evaluates SIN(2*PI()*t/7), so at t % 7 == 0
            # the two ulp-sized results round to +0.0 vs -0.0 and the
            # driver's byte-level hash diverges (r9's one red row).
            (F.round("sin1_7", 6) + F.lit(0.0)).alias("sin1_7"),
            (F.round("cos1_7", 6) + F.lit(0.0)).alias("cos1_7"),
            F.col("trend"),
        )

    q["date_features_all"] = date_feats_all

    def boxcox_q(spark, sf):
        from mlforecast_spark.target_transforms import LocalBoxCox

        panel = _panel(spark, sf)
        tfm = LocalBoxCox()
        tfm.set_column_names("unique_id", "ds", "y")
        out = tfm.fit_transform(panel)
        return out.select("unique_id", "ds", F.round("y", 6).alias("y_bc"))

    q["local_boxcox"] = boxcox_q

    def auto_diff_q(spark, sf):
        from mlforecast_spark.target_transforms import AutoDifferences

        panel = _panel(spark, sf)
        tfm = AutoDifferences(max_diffs=2)
        tfm.set_column_names("unique_id", "ds", "y")
        out = tfm.fit_transform(panel)
        return out.select("unique_id", "ds", F.round("y", 6).alias("y_ad"))

    q["auto_differences"] = auto_diff_q

    # --- target transforms ---------------------------------------------
    def diff1(spark, sf):
        from mlforecast_spark.target_transforms import Differences

        panel = _panel(spark, sf)
        tfm = Differences([1])
        out = tfm.fit_transform(panel)
        return out.select("unique_id", "ds", F.round("y", 6).alias("y_diff"))

    q["differences"] = diff1

    def local_scalers(spark, sf):
        """All three Local* scalers in one slot: each fit_transform runs the
        real operator; the three outputs join back on (unique_id, ds) so each
        scaled column sits under the driver's hash gate."""
        from mlforecast_spark.target_transforms import (
            LocalMinMaxScaler,
            LocalRobustScaler,
            LocalStandardScaler,
        )

        panel = _panel(spark, sf)
        z = (
            LocalStandardScaler()
            .fit_transform(panel)
            .select("unique_id", "ds", F.round("y", 6).alias("y_z"))
        )
        mm = (
            LocalMinMaxScaler()
            .fit_transform(panel)
            .select("unique_id", "ds", F.round("y", 6).alias("y_mm"))
        )
        r = (
            LocalRobustScaler(scale="iqr")
            .fit_transform(panel)
            .select("unique_id", "ds", F.round("y", 6).alias("y_r"))
        )
        return z.join(mm, ["unique_id", "ds"]).join(r, ["unique_id", "ds"])

    q["local_scalers"] = local_scalers

    def log1p_q(spark, sf):
        from mlforecast_spark.target_transforms import GlobalSklearnTransformer

        panel = _panel(spark, sf)
        tfm = GlobalSklearnTransformer("log1p")
        tfm.set_column_names("unique_id", "ds", "y")
        out = tfm.fit_transform(panel)
        return out.select("unique_id", "ds", F.round("y", 6).alias("y_log"))

    q["global_log1p"] = log1p_q

    # --- documents: text analysis + dedup ------------------------------
    def doc_text_profile(spark, sf):
        """Merged slot: token stats + language ID + fingerprint (one fused
        projection) PLUS Okapi BM25 scores for a fixed 3-term query — the
        retrieval-scoring path, hash-gated per doc (rounded to 6 dp; the
        per-doc sum spans ≤3 terms, so cross-engine reassociation noise
        sits ~1e-16, ten orders below the rounding step) PLUS the full
        Gopher quality gate (quality_filter: repetition signals, per-rule
        drop reasons, keep flag) — the gate's formula is deterministic
        pure expressions, so it hash-verifies end-to-end; only the
        TRAINABLE classifier stays rows-only. The bench line stays pinned
        to the plain text_profile workload (bench.py).

        r11: computed via the fused ``profile_quality_bm25`` plan — the
        three legs used to be composed as text_profile ⋈ bm25 ⋈ quality
        (each leg rescanning and re-shuffling the corpus: ~8 scans, 6+
        doc-keyed exchanges); the fusion derives every aggregation signal
        from ONE per-(id, gram) count table and runs 2 corpus scans, 1
        gram shuffle, 1 id join. Outputs proven exactly equal to the
        composition (test_profile_quality_bm25_fused_matches_composition)
        and STRICT oracle-green."""
        from mlforecast_spark.operators.text import profile_quality_bm25

        fused = profile_quality_bm25(_docs(spark, sf), _BM25_TERMS)
        keep_front = [
            c
            for c in fused.columns
            if c not in ("bm25", "type_token_ratio", "top_token_frac",
                         "dup_bigram_frac", "drop_reasons", "keep")
        ]
        return fused.select(
            *keep_front,
            F.round("bm25", 6).alias("bm25"),
            "type_token_ratio",
            "top_token_frac",
            "dup_bigram_frac",
            F.array_join("drop_reasons", ",").alias("drop_reasons"),
            "keep",
        )

    q["doc_text_profile"] = doc_text_profile

    def exact_dup(spark, sf):
        """Merged slot: exact document dedup (digest groupBy) PLUS
        corpus-wide keep-first paragraph dedup (dedup_paragraphs) on the
        same docs — the synthetic corpus is single-line, so the paragraph
        separator is the token boundary, which exercises the identical
        explode → winner-agg → reassemble plan with maximal duplicate
        mass. The cleaned text is folded under the hash gate as
        (md5, length)."""
        from mlforecast_spark.operators.dedup import (
            dedup_paragraphs,
            exact_duplicates,
        )

        docs = _docs(spark, sf)
        para = dedup_paragraphs(docs, sep=" ").select(
            "doc_id",
            F.md5("text").alias("para_clean_md5"),
            F.length("text").cast("long").alias("para_clean_chars"),
        )
        return exact_duplicates(docs).join(para, "doc_id")

    q["dedup_exact"] = exact_dup

    def jaccard(spark, sf):
        from mlforecast_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(
            _docs(spark, sf), n=3, block_cols=("lang", "source"), threshold=0.2
        )

    q["dedup_ngram_jaccard"] = jaccard

    def minhash(spark, sf):
        from mlforecast_spark.operators.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
            shingle_df,
        )

        docs = _docs(spark, sf)
        # minhash MIN is duplicate-invariant: skip the shingle-dedup shuffle;
        # bucket cap opted in explicitly (the 100 TB degenerate-bucket guard)
        sig = minhash_signatures(shingle_df(docs, n=3, distinct=False))
        return minhash_lsh_candidates(sig, max_bucket_size=1000).filter(
            F.col("est_jaccard") >= 0.5
        )

    q["dedup_minhash_lsh"] = minhash

    def minhash_verified(spark, sf):
        """LSH recall promoted into the correctness contract: candidates from
        banded minhash, exact-verified by n-gram Jaccard >= 0.3. The result
        equals the exact all-pairs set (the DuckDB oracle) iff LSH recall at
        this threshold is 100% — any recall regression breaks the hash.

        Banding comes from ``optimal_bands(32, threshold=0.3)`` = (12, 2)
        so the S-curve matches the query's own verification threshold. The
        r9 sf1 STRICT sweep caught the default (8, 4) — tuned for t~0.59 —
        missing 223/250600 pairs at j 0.7-0.9, each miss binomially
        consistent with (1-s^4)^8 (no agreeing band on inspection); the
        solver banding measures recall 1.0 on the same corpus at +53%
        candidates (BASELINE.md round-9 notes)."""
        from mlforecast_spark.operators.dedup import (
            jaccard_verify_pairs,
            minhash_lsh_candidates,
            minhash_signatures,
            optimal_bands,
            shingle_df,
        )

        docs = _docs(spark, sf)
        sig = minhash_signatures(shingle_df(docs, n=3, distinct=False))
        n_bands, _ = optimal_bands(32, threshold=0.3)
        cand = minhash_lsh_candidates(sig, num_bands=n_bands).select(
            "id_a", "id_b"
        )
        # r11: verify via the BOUNDED verifier (shingles semi-joined onto the
        # candidate set — join volume linear in candidates), not the all-pairs
        # shingle self-join: the exact form OOM'd Python workers at sf10
        # (500k docs). Output is identical — candidates ∩ {jaccard >= 0.3} —
        # and still equals the oracle's all-pairs set iff LSH recall is 100%
        # (jaccard_verify_pairs is equality-pinned vs ngram_jaccard_pairs in
        # test_jaccard_verify_pairs_matches_allpairs).
        return jaccard_verify_pairs(docs, cand, n=3, threshold=0.3).select(
            "id_a", "id_b", "jaccard"
        )

    q["dedup_minhash_verified"] = minhash_verified

    def simhash_q(spark, sf):
        from mlforecast_spark.operators.dedup import simhash, simhash_candidates

        fps = simhash(_docs(spark, sf))
        return simhash_candidates(fps, max_hamming=3)

    q["dedup_simhash"] = simhash_q

    # --- embeddings: similarity search ----------------------------------
    def ann_brute(spark, sf):
        from mlforecast_spark.operators.similarity import cosine_topk

        embs = _embs(spark, sf)
        queries_df = embs.filter(F.col("vec_id") < 20)
        return cosine_topk(embs, queries_df, k=10)

    q["ann_cosine_topk"] = ann_brute

    def emb_near_dups(spark, sf):
        from mlforecast_spark.operators.similarity import cosine_topk

        embs = _embs(spark, sf)
        pairs = cosine_topk(embs, embs, k=3)
        return pairs.filter(F.col("cosine") >= 0.35).select(
            "query_id", "neighbor_id", "cosine"
        )

    q["embedding_near_dups"] = emb_near_dups

    def dedup_clusters_q(spark, sf):
        """Pairs -> clusters: near-dup candidate pairs resolved into
        connected components, each doc labeled with its cluster's canonical
        (min) id — the step that turns pairwise dedup output into an
        actionable keep/drop decision."""
        from mlforecast_spark.operators.dedup import connected_components

        return connected_components(
            emb_near_dups(spark, sf), src="query_id", dst="neighbor_id"
        )

    q["dedup_clusters"] = dedup_clusters_q

    def stratified_sample_q(spark, sf):
        """Deterministic per-language sample: exactly k docs per lang chosen
        by md5 order — reproducible across engines, partitionings, reruns."""
        from mlforecast_spark.operators.sampling import stratified_hash_sample

        docs = _docs(spark, sf).select("doc_id", "lang")
        out = stratified_hash_sample(docs, ["lang"], k=20)
        return out.select(
            "lang", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank")
        )

    q["stratified_sample_docs"] = stratified_sample_q

    def mixture_sample_q(spark, sf):
        """Domain-mixture resampling: downsample so the corpus matches a
        target lang composition. Weights are exact binary floats (0.5/0.25/
        0.125) so the driver-side float math is bit-identical to the SQL
        oracle's DOUBLE arithmetic."""
        from mlforecast_spark.operators.sampling import mixture_sample

        docs = _docs(spark, sf).select("doc_id", "lang")
        out = mixture_sample(
            docs, "lang", {"en": 0.5, "de": 0.25, "fr": 0.125, "zh": 0.125}
        )
        return out.select("doc_id", "lang")

    q["mixture_sample_docs"] = mixture_sample_q

    def pack_concat_q(spark, sf):
        """GPT-style concat-then-chunk sequence packing on the documents
        table (budget counted in chars — a deterministic, engine-portable
        token proxy). num_shards=1 so the DuckDB oracle needs no xxhash64;
        the sharded plan differs only in the partitionBy key."""
        from mlforecast_spark.operators.packing import pack_sequences

        docs = _docs(spark, sf).select(
            "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
        )
        return pack_sequences(docs, max_tokens=1000, num_shards=1)

    q["pack_concat_docs"] = pack_concat_q

    def lm_score_q(spark, sf):
        """Distributed Stupid Backoff bigram LM: train on even doc_ids,
        score odd doc_ids by mean log10 backoff score. The DuckDB oracle
        re-derives the full model in SQL (string grams instead of the
        engine's xxhash64 keys — identical joins, collision-free either
        way) and mirrors the exact cascade/float-op order."""
        from mlforecast_spark.operators.lm import score_docs, train_ngram_lm

        docs = _docs(spark, sf)
        lm = train_ngram_lm(docs.filter("doc_id % 2 = 0"), order=2)
        return score_docs(docs.filter("doc_id % 2 = 1"), lm, alpha=0.4)

    q["doc_lm_score"] = lm_score_q

    def ann_lsh(spark, sf):
        from mlforecast_spark.operators.similarity import lsh_topk

        embs = _embs(spark, sf)
        queries_df = embs.filter(F.col("vec_id") < 20)
        return lsh_topk(embs, queries_df, k=10, dim=64)

    q["ann_lsh_topk"] = ann_lsh

    def ann_ivf(spark, sf):
        """Full-probe IVF == brute force exactly, so the plumbing (k-means
        partition, probe join, exact re-rank) is oracle-checkable; recall of
        partial probing is pytest-covered."""
        from mlforecast_spark.operators.similarity import ivf_topk

        embs = _embs(spark, sf)
        queries_df = embs.filter(F.col("vec_id") < 20)
        return ivf_topk(embs, queries_df, k=10, n_lists=8, nprobe=8)

    q["ann_ivf_topk"] = ann_ivf

    def ann_ivf_probe(spark, sf):
        """Bench-scale IVF configuration: partial probe (nprobe=4 of 16
        lists, 3 Lloyd iterations) — each query touches ~1/4 of the corpus,
        the plan you'd run at 100 TB. No deterministic SQL oracle (k-means
        assignment is seed-dependent); recall is pytest-covered and
        tools/bench_oracle.py carries a same-shape DuckDB IVF for the
        wall-clock ratio."""
        from mlforecast_spark.operators.similarity import ivf_topk

        embs = _embs(spark, sf)
        queries_df = embs.filter(F.col("vec_id") < 20)
        return ivf_topk(
            embs, queries_df, k=10, n_lists=16, nprobe=4, max_iter=3,
            train_fraction=0.2,
        )

    q["ann_ivf_probe"] = ann_ivf_probe

    def exog_q(spark, sf):
        from mlforecast_spark.feature_engineering import transform_exog
        from mlforecast_spark.lag_transforms import RollingMean

        prices = _panel(spark, sf).select(
            "unique_id", "ds", (F.col("y") * 2).alias("price")
        )
        out = transform_exog(
            prices, lags=[1], lag_transforms={1: [RollingMean(window_size=7)]}
        )
        return out.select(
            "unique_id",
            "ds",
            F.round("price", 6).alias("price"),
            F.round("price_lag1", 6).alias("price_lag1"),
            F.round(
                F.col("`price_rolling_mean_lag1_window_size7`"), 6
            ).alias("price_rm7"),
        )

    q["transform_exog"] = exog_q

    # --- end-to-end forecast (no SQL oracle: model training) ------------
    def predict_q(spark, sf):
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import LinearRegression

        panel = _panel(spark, sf)
        mf = MLForecast(
            models=[LinearRegression()],
            freq="D",
            lags=[1, 7],
            lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
            date_features=["dayofweek"],
        )
        mf.fit(panel)
        return mf.predict(7)

    q["predict_recursive_linreg"] = predict_q

    def events_tumbling(spark, sf):
        from mlforecast_spark.streaming import tumbling_aggregate
        from mlforecast_spark.utils import load_events

        out = tumbling_aggregate(
            load_events(spark, sf), window="1 day", agg="sum"
        )
        return out.select("event_type", "ds", F.round("y", 6).alias("y"))

    q["events_tumbling_agg"] = events_tumbling

    def events_sessionize(spark, sf):
        from pyspark.sql import Window
        from mlforecast_spark.utils import load_events

        ev = load_events(spark, sf)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        return ev.select(
            "event_id",
            "user_id",
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("long").alias("session_idx"),
        )

    q["events_sessionize"] = events_sessionize

    def predict_snaive(spark, sf):
        """The recursive predict ENGINE under the hash gate: SeasonalNaive(7)
        over h=10 has a closed form — steps 1..7 read the 7 last observed
        values positionally, steps 8..10 feed back the loop's own
        predictions — so the whole loop (state advance, frontier build, time
        arithmetic, prediction append) is DuckDB-checkable."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import SeasonalNaive

        panel = _panel(spark, sf)
        mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
        mf.fit(panel)
        return mf.predict(10).select(
            F.lit("snaive").alias("model"),
            "unique_id",
            "ds",
            F.round("SeasonalNaive", 6).alias("yhat"),
        )

    def predict_gbt_dow(spark, sf):
        """The GBT TRAINER + scoring path under the hash gate: with one
        integer feature (dayofweek), min_child_samples=1 and max_depth=6,
        every tree isolates each of the 7 weekday values (any impure node
        keeps a positive-gain split available, and 6 levels suffice for any
        greedy split order), so boosting reduces to a per-weekday scalar
        recurrence c_m = c_{m-1} + lr*(S_d - n_d*c_{m-1})/(n_d + lambda)
        from c_0 = mean(y) — unrolled exactly in the DuckDB oracle. The
        count-valued target keeps all sums integer-exact so both engines
        agree bit-for-bit after round(6). Exercises fit_models ->
        GradientBoostedTrees (histogram split finder, L2 leaf values,
        `models_gbt.py`) and the recursive predict loop's broadcast-model
        scoring; reference behavior
        `/root/reference/mlforecast/distributed/forecast.py:408-418`."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models_gbt import GradientBoostedTrees

        panel = _count_panel(spark, sf)
        mf = MLForecast(
            models=[
                GradientBoostedTrees(
                    n_estimators=3,
                    learning_rate=0.5,
                    max_depth=6,
                    min_child_samples=1,
                    reg_lambda=1.0,
                )
            ],
            freq="D",
            date_features=["dayofweek"],
        )
        mf.fit(panel)
        return mf.predict(7).select(
            F.lit("gbt").alias("model"),
            "unique_id",
            "ds",
            F.round("GradientBoostedTrees", 6).alias("yhat"),
        )

    def predict_cogroup_snaive(spark, sf):
        """The COGROUPED predict engine (local_predict.py: the whole h-step
        rollout in one applyInPandas job) under the same SeasonalNaive
        closed form — the hash gate proves the single-job engine
        step-for-step equal to the lockstep loop's oracle."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import SeasonalNaive

        panel = _panel(spark, sf)
        mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
        mf.fit(panel)
        return mf.predict(10, engine="cogroup").select(
            F.lit("snaive_cogroup").alias("model"),
            "unique_id",
            "ds",
            F.round("SeasonalNaive", 6).alias("yhat"),
        )

    def predict_linreg_lag7(spark, sf):
        """The LINEAR Gram trainer under the hash gate: one feature (lag7)
        on the integer count panel makes OLS DuckDB-expressible — all
        normal-equation sums are fp-exact integers (< 2^53), so
        b = (nΣxy − ΣxΣy)/(nΣxx − Σx²) and a = (Σy − bΣx)/n agree with
        the Gram solve (`models.py:83`, JVM HashAggregate + numpy 2×2
        solve) to ~1e-15 relative — far below the round(6) boundary at
        count scale. h=10 exercises the rollout's feedback too: steps
        8-10 predict from the loop's own step-(i-7) predictions, a
        closed form (a + b·a + b²·x) in the oracle."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import LinearRegression

        panel = _count_panel(spark, sf)
        mf = MLForecast(models={"LR": LinearRegression()}, freq="D", lags=[7])
        mf.fit(panel)
        return mf.predict(10).select(
            F.lit("linreg").alias("model"),
            "unique_id",
            "ds",
            F.round("LR", 6).alias("yhat"),
        )

    def predict_closed_forms(spark, sf):
        """Merged slot (the driver checks only the first 50 queries): the
        recursive predict engine under SeasonalNaive's positional closed
        form (h=10, incl. steps 8-10 feeding back the loop's own
        predictions) UNION the same rollout through the cogrouped
        single-job engine UNION the GBT trainer's per-weekday boosting
        closed form UNION the linear Gram trainer's single-feature OLS
        closed form — all hash-exact against DuckDB."""
        return predict_snaive(spark, sf).unionByName(
            predict_cogroup_snaive(spark, sf)
        ).unionByName(
            predict_gbt_dow(spark, sf)
        ).unionByName(
            predict_linreg_lag7(spark, sf)
        )

    q["predict_snaive_gbt"] = predict_closed_forms

    def cv_snaive(spark, sf):
        """cross_validation under the hash gate: with SeasonalNaive(7) and
        h=7 every window's predictions are the positional closed form over
        its truncated history, so cutoff arithmetic, per-window state capture
        and the valid join are all DuckDB-checkable."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import SeasonalNaive

        panel = _panel(spark, sf)
        mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
        cv = mf.cross_validation(panel, n_windows=2, h=7)
        return cv.select(
            "unique_id",
            "ds",
            "cutoff",
            F.round("y", 6).alias("y"),
            F.round("SeasonalNaive", 6).alias("yhat"),
        )

    q["cross_validation_snaive"] = cv_snaive

    def conformal_snaive(spark, sf):
        """Conformal attach machinery under the hash gate: SeasonalNaive
        closed forms make the backtest scores, the per-(series, step)
        quantiles and the interval columns all DuckDB-expressible."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.conformal import PredictionIntervals
        from mlforecast_spark.models import SeasonalNaive

        panel = _panel(spark, sf)
        mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
        mf.fit(
            panel,
            prediction_intervals=PredictionIntervals(
                n_windows=2, h=7, method="conformal_error"
            ),
        )
        out = mf.predict(7, level=[80])
        return out.select(
            "unique_id",
            "ds",
            F.round("SeasonalNaive", 6).alias("yhat"),
            F.round(F.col("`SeasonalNaive-lo-80`"), 6).alias("lo"),
            F.round(F.col("`SeasonalNaive-hi-80`"), 6).alias("hi"),
        )

    q["conformal_snaive"] = conformal_snaive

    def conformal_dist_snaive(spark, sf):
        """conformal_distribution under the hash gate: the symmetric score
        union {+s, -s} and its per-(series, step) quantiles are closed-form
        SQL once SeasonalNaive makes the backtest scores closed-form."""
        from mlforecast_spark import MLForecast
        from mlforecast_spark.conformal import PredictionIntervals
        from mlforecast_spark.models import SeasonalNaive

        panel = _panel(spark, sf)
        mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
        mf.fit(
            panel,
            prediction_intervals=PredictionIntervals(
                n_windows=2, h=7, method="conformal_distribution"
            ),
        )
        out = mf.predict(7, level=[80])
        return out.select(
            "unique_id",
            "ds",
            F.round("SeasonalNaive", 6).alias("yhat"),
            F.round(F.col("`SeasonalNaive-lo-80`"), 6).alias("lo"),
            F.round(F.col("`SeasonalNaive-hi-80`"), 6).alias("hi"),
        )

    q["conformal_distribution_snaive"] = conformal_dist_snaive

    def conformal_q(spark, sf):
        from mlforecast_spark import MLForecast
        from mlforecast_spark.conformal import PredictionIntervals
        from mlforecast_spark.models import LinearRegression

        panel = _panel(spark, sf)
        mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
        mf.fit(
            panel,
            prediction_intervals=PredictionIntervals(n_windows=2, h=7),
        )
        return mf.predict(7, level=[80, 95])

    q["conformal_intervals"] = conformal_q

    def gbt_q(spark, sf):
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models_gbt import GradientBoostedTrees

        panel = _panel(spark, sf)
        mf = MLForecast(
            models=[GradientBoostedTrees(n_estimators=30, max_depth=4)],
            freq="D",
            lags=[1, 7],
            lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
            date_features=["dayofweek"],
        )
        mf.fit(panel)
        return mf.predict(7)

    q["predict_gbt"] = gbt_q

    def cv_q(spark, sf):
        from mlforecast_spark import MLForecast
        from mlforecast_spark.models import LinearRegression

        panel = _panel(spark, sf)
        mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
        return mf.cross_validation(panel, n_windows=2, h=7)

    q["cross_validation"] = cv_q

    def asof_events_q(spark, sf):
        """Rows-only tail entry (the 50-slot oracle window is full): the
        distributed as-of join aligning each purchase event with the
        prevailing click per user, plus the keyless nearest variant's match
        timestamps folded in. Deterministic; DuckDB's native ASOF JOIN and
        pandas.merge_asof pin exact values in tests/test_asof_join.py."""
        from mlforecast_spark.joins import asof_join
        from mlforecast_spark.utils import load_events

        ev = load_events(spark, sf)
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("click_value")
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("value").alias("purchase_value")
        )
        return asof_join(purchases, clicks, on="ts", by=["user_id"]).select(
            "user_id", "ts", F.round("purchase_value", 6).alias("purchase_value"),
            F.round("click_value", 6).alias("click_value"),
        )

    q["asof_events"] = asof_events_q

    def range_events_q(spark, sf):
        """Rows-only tail entry: range_join pairing each purchase's
        [ts, ts+1h] window with the clicks inside it (block-id equi-join
        scale shape); exact pairs pinned vs DuckDB BETWEEN in
        tests/test_asof_join.py."""
        from mlforecast_spark.joins import range_join
        from mlforecast_spark.utils import load_events

        ev = load_events(spark, sf)
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        w = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", us.alias("lo"), (us + 3600 * 10**6).alias("hi")
        )
        r = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("u"), us.alias("qts"),
            F.col("value").alias("click_value"),
        ).withColumnRenamed("u", "user_id")
        return range_join(
            w, r, "lo", "hi", "qts", by=["user_id"], block_size=3600 * 10**6
        )

    q["range_join_events"] = range_events_q

    # Driver-gate ordering: the harness oracle-checks only the first 50
    # queries() entries, so every oracle-backed query must precede the
    # rows-only family (trained-model outputs / LSH candidate sets that have
    # no deterministic SQL oracle). Keep this list in sync with oracle_sql().
    def repetition_q(spark, sf):
        """Rows-only tail entry (outside the 50-query oracle window):
        repetition quality signals; exact values pinned by
        tests/test_operators.py::test_repetition_stats."""
        from mlforecast_spark.operators.text import repetition_stats

        return repetition_stats(_docs(spark, sf))

    q["doc_repetition_stats"] = repetition_q

    def semantic_dedup_q(spark, sf):
        """Rows-only tail entry: SemDeDup semantic dedup over the embeddings
        table (k-means assignment is seed-deterministic but has no SQL
        oracle); semantics pinned by test_semantic_dedup_*."""
        from mlforecast_spark.operators.similarity import semantic_dedup

        return semantic_dedup(_embs(spark, sf), eps=0.15, n_lists=8, seed=7)

    q["semantic_dedup_embeddings"] = semantic_dedup_q

    def quality_scores_q(spark, sf):
        """Rows-only tail entry: quality classifier trained on a weak label
        (length median split) via distributed IRLS, scoring the corpus;
        accuracy pinned by test_quality_classifier."""
        from mlforecast_spark.operators.text import QualityClassifier

        docs = _docs(spark, sf)
        lab = docs.withColumn("label", (F.col("n_chars") > 180).cast("double"))
        clf = QualityClassifier().fit(lab)
        return clf.score(docs)

    q["doc_quality_scores"] = quality_scores_q

    def repeated_spans_q(spark, sf):
        """Rows-only tail entry: cross-doc repeated 8-token spans; exact
        offsets pinned by test_repeated_spans."""
        from mlforecast_spark.operators.dedup import repeated_spans

        return repeated_spans(_docs(spark, sf), window=8, min_docs=2)

    q["doc_repeated_spans"] = repeated_spans_q

    def bpe_counts_q(spark, sf):
        """Rows-only tail entry: learned-BPE token counts (train on the
        corpus word histogram, apply distributed). The learned merge replay
        has no SQL oracle; the corpus-scale step (the word histogram) is
        DuckDB-parity-pinned by tests/test_bpe.py, and the learner by a
        naive-reference parity test."""
        from mlforecast_spark.operators.bpe import train_bpe

        docs = _docs(spark, sf)
        tok = train_bpe(docs, num_merges=200, max_words=5000)
        return tok.token_counts(docs)

    q["bpe_token_counts"] = bpe_counts_q

    def ann_pq_q(spark, sf):
        """Rows-only tail entry: PQ/ADC top-k over the embeddings table —
        the 100 TB memory path (search scans only the m-byte codes).
        Codeword-exactness and retrieval quality pinned by test_pq_*."""
        from mlforecast_spark.operators.similarity import build_pq_index, pq_search

        embs = _embs(spark, sf)
        idx = build_pq_index(embs, m=8, k=64, seed=7, max_iter=5)
        qdf = embs.filter(F.col("vec_id") < 20)
        return pq_search(idx, qdf, k=10).select(
            "query_id", "neighbor_id", "rank"
        )

    q["ann_pq_topk"] = ann_pq_q

    def bm25_q(spark, sf):
        """Rows-only tail entry: the top-k SELECTION path over BM25 scores.
        The scoring formula itself is hash-exact oracle-backed since round
        7 via the merged doc_text_profile slot (bm25 column, all docs); this
        entry additionally exercises the TakeOrderedAndProject top-k."""
        from mlforecast_spark.operators.text import bm25_top_k

        return bm25_top_k(
            _docs(spark, sf), ["spark", "window", "vector"], k=50
        ).select("doc_id", F.round("bm25", 6).alias("bm25"))

    q["doc_bm25_topk"] = bm25_q

    def media_phash_q(spark, sf):
        """Rows-only tail entry: the multimodal near-dup path end-to-end
        through the driver contract — deterministic synthetic PPM images
        (pure-numpy low-frequency cosine mixtures seeded by ``doc_id //
        20``, ±3 per-pixel noise seeded by ``doc_id``, so every run builds
        byte-identical payloads) → real P6 decode → DCT pHash →
        pigeonhole-banded candidate pairs. Images of the same class land
        within a few bits; cross-class ≥ ~16, so the pair set is exactly
        the within-class pairs and fully deterministic."""
        from pyspark.sql import types as T

        from mlforecast_spark.operators.multimodal import (
            image_phash,
            phash_candidates,
        )

        ids = _docs(spark, sf).select("doc_id").filter(F.col("doc_id") < 100)
        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )

        def gen(batches):
            import numpy as np
            import pandas as pd

            size = 64
            y, x = np.mgrid[0:size, 0:size]

            def class_image(seed):
                rng = np.random.default_rng(1000 + seed)
                img = np.zeros((size, size))
                for _ in range(6):
                    fy, fx = rng.uniform(0.5, 3, 2)
                    ph = rng.uniform(0, 2 * np.pi)
                    img += rng.uniform(0.5, 1.5) * np.cos(
                        2 * np.pi * (fy * y / size + fx * x / size) + ph
                    )
                img = (img - img.min()) / (img.max() - img.min()) * 255
                return np.stack([img, img * 0.8, img * 0.5], axis=-1)

            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    base = class_image(int(did) // 20)
                    noise = np.random.default_rng(int(did)).integers(
                        -3, 4, base.shape
                    )
                    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
                    payloads.append(
                        b"P6\n%d %d\n255\n" % (size, size) + arr.tobytes()
                    )
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        imgs = ids.mapInPandas(gen, schema=out_schema)
        fps = image_phash(imgs)
        return phash_candidates(fps, max_hamming=8).select(
            "id_a", "id_b", "hamming"
        )

    q["image_phash_neardups"] = media_phash_q

    def media_afp_q(spark, sf):
        """Rows-only tail entry: the audio near-dup path end-to-end —
        deterministic synthetic PCM-16 WAV clips (three-tone mixtures
        seeded by ``doc_id // 20``, per-doc gain 0.5–1.0 and tiny seeded
        noise) → real WAV decode → Haitsma–Kalker spectral fingerprint →
        banded candidate pairs. Gain never moves the hash (sign
        invariance); the seeded per-doc noise moves a minority of
        fingerprints past the hamming cut, so the output is a
        deterministic subset of the within-class pairs with ZERO
        cross-class pairs (verified 719/950 at sf0.01, precision 1.0)."""
        from pyspark.sql import types as T

        from mlforecast_spark.operators.multimodal import (
            afp_candidates,
            audio_fingerprints,
        )

        ids = _docs(spark, sf).select("doc_id").filter(F.col("doc_id") < 100)
        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )

        def gen(batches):
            import io
            import wave

            import numpy as np
            import pandas as pd

            rate = 8000
            t = np.arange(rate * 2) / rate

            def class_clip(seed):
                rng = np.random.default_rng(2000 + seed)
                sig = np.zeros(len(t))
                for _ in range(3):
                    f = rng.uniform(150, 2800)
                    sig += rng.uniform(0.2, 0.4) * np.sin(2 * np.pi * f * t)
                return sig

            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    rng = np.random.default_rng(int(did))
                    sig = class_clip(int(did) // 20) * rng.uniform(0.5, 1.0)
                    sig = sig + rng.normal(0, 0.003, len(t))
                    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(rate)
                        wf.writeframes(pcm.tobytes())
                    payloads.append(buf.getvalue())
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        clips = ids.mapInPandas(gen, schema=out_schema)
        fps = audio_fingerprints(clips)
        return afp_candidates(fps, max_hamming=8).select(
            "id_a", "id_b", "hamming"
        )

    q["audio_afp_neardups"] = media_afp_q

    rows_only = [
        "image_phash_neardups",
        "audio_afp_neardups",
        "doc_bm25_topk",
        "ann_pq_topk",
        "bpe_token_counts",
        "doc_repetition_stats",
        "semantic_dedup_embeddings",
        "doc_quality_scores",
        "doc_repeated_spans",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_lsh_topk",
        "ann_ivf_probe",
        "predict_recursive_linreg",
        "conformal_intervals",
        "predict_gbt",
        "cross_validation",
        "asof_events",
        "range_join_events",
    ]
    ordered = {k: v for k, v in q.items() if k not in rows_only}
    # Invariants (RuntimeError, not assert — must survive `python -O`):
    # every query ahead of the driver's 50-row correctness window has an
    # oracle_sql() entry, nothing in the rows-only tail does, and the
    # oracle-backed prefix fits inside the window.
    oracle_keys = set(oracle_sql())
    unoracled = [k for k in ordered if k not in oracle_keys]
    misplaced = [k for k in rows_only if k in oracle_keys]
    if unoracled or misplaced:
        raise RuntimeError(
            f"queries()/oracle_sql() out of sync: missing oracle for "
            f"{unoracled}; rows_only entries with an oracle: {misplaced}"
        )
    if len(ordered) > 50:
        raise RuntimeError(
            f"{len(ordered)} oracle-backed queries exceed the driver's 50-row "
            "correctness window — merge variants before adding more"
        )
    for k in rows_only:
        ordered[k] = q[k]
    return ordered


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["panel_build"] = f"WITH {PANEL_SQL} SELECT unique_id, ds, y FROM panel"

    o["validation_stats"] = (
        f"WITH {PANEL_SQL} SELECT unique_id,"
        " MIN(ds) AS start, MAX(ds) AS end, COUNT(*) AS n_rows,"
        " COUNT(DISTINCT ds) AS n_unique,"
        " CAST(SUM(CASE WHEN y IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_target,"
        " CAST(FLOOR(DATEDIFF('day', MIN(ds), MAX(ds))) + 1 AS BIGINT) AS expected_rows,"
        " CAST(COUNT(DISTINCT ds) < DATEDIFF('day', MIN(ds), MAX(ds)) + 1 AS INTEGER) AS has_gaps,"
        " CAST(COUNT(*) > COUNT(DISTINCT ds) AS INTEGER) AS has_dups"
        " FROM panel GROUP BY unique_id"
    )

    o["fill_gaps_future_grid"] = (
        f"WITH {PANEL_SQL}, lim AS ("
        " SELECT unique_id, MIN(ds) AS min_ds, MAX(ds) AS max_ds"
        " FROM panel GROUP BY 1),"
        " grid AS (SELECT unique_id, CAST(unnest(generate_series("
        "   CAST(min_ds AS TIMESTAMP),"
        "   CAST(max_ds AS TIMESTAMP) + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS ds"
        "  FROM lim)"
        " SELECT g.unique_id, g.ds, p.y"
        " FROM grid g LEFT JOIN panel p ON g.unique_id = p.unique_id AND g.ds = p.ds"
    )

    o["keep_last_n"] = (
        f"WITH {PANEL_SQL} SELECT unique_id, ds, y FROM panel"
        " QUALIFY ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds DESC) <= 28"
    )

    o["expand_target_leads"] = (
        f"WITH {PANEL_SQL} SELECT unique_id, ds,"
        " LEAD(y, 1) OVER (PARTITION BY unique_id ORDER BY ds) AS y_lead1,"
        " LEAD(y, 2) OVER (PARTITION BY unique_id ORDER BY ds) AS y_lead2"
        " FROM panel"
    )

    o["lag7"] = (
        f"WITH {PANEL_SQL}, base AS ("
        " SELECT unique_id, ds, y, CAST(isodow(ds) - 1 AS INTEGER) AS dow"
        " FROM panel)"
        " SELECT unique_id, ds,"
        " ROUND(LAG(y, 7) OVER (PARTITION BY unique_id ORDER BY ds), 6) AS lag7_val,"
        " ROUND(LAG(y, 1) OVER (PARTITION BY unique_id, dow ORDER BY ds), 6) AS ll"
        " FROM base"
    )

    o["rolling_mean"] = _rolling_sql(_MEAN_AGG, _MEAN_RES, 1, 7, 7, "rm")
    o["rolling_std_quantile"] = (
        f"WITH {PANEL_SQL}, qpanel AS (SELECT unique_id, ds, {QUANT_SQL} AS y"
        " FROM panel), aggs AS ("
        " SELECT unique_id, ds, SUM(y) OVER w AS w_sum, SUM(y*y) OVER w AS w_sum_sq,"
        "  COUNT(y) OVER w AS w_cnt, quantile_cont(y, 0.5) OVER w AS w_q,"
        "  MIN(y) OVER w AS w_min, MAX(y) OVER w AS w_max FROM qpanel"
        " WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        "  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, "
        + _round6_repr(
            "CASE WHEN w_cnt >= 7 AND w_cnt > 1 THEN"
            " SQRT(GREATEST((w_sum_sq - w_sum * w_sum * 1.0 / w_cnt)"
            " / (w_cnt - 1), 0.0)) END"
        )
        + " AS rs,"
        "  ROUND(CASE WHEN w_cnt >= 7 THEN w_q END, 6) AS rq,"
        "  ROUND(CASE WHEN w_cnt >= 7 THEN w_min END, 6) AS rmin,"
        "  ROUND(CASE WHEN w_cnt >= 7 THEN w_max END, 6) AS rmax"
        " FROM aggs"
    )
    o["rolling_mean_min_samples"] = _rolling_sql(_MEAN_AGG, _MEAN_RES, 2, 14, 3, "rmms")
    # Offset(RollingMean(7), 2) at lag 1 == RollingMean(7) at lag 3
    o["offset_rolling_mean"] = _rolling_sql(_MEAN_AGG, _MEAN_RES, 3, 7, 7, "orm")

    o["pooled_global_expanding_std"] = (
        f"WITH {PANEL_SQL}, qpanel AS ("
        f" SELECT unique_id, ds, ROUND(y / 4096) AS y FROM panel), base AS ("
        " SELECT unique_id, ds, y, DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT ord, SUM(y) AS y FROM base GROUP BY ord),"
        " aggs AS (SELECT ord, SUM(y) OVER w AS s, SUM(y*y) OVER w AS sq,"
        "  COUNT(y) OVER w AS c FROM collapsed WINDOW w AS (ORDER BY ord"
        "   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        " SELECT b.unique_id, b.ds, ROUND(CASE WHEN a.c > 1 THEN"
        "  SQRT(GREATEST((a.sq - a.s * a.s * 1.0 / a.c) / (a.c - 1), 0.0)) END, 6) AS pges"
        " FROM base b LEFT JOIN aggs a ON b.ord = a.ord"
    )

    dow_dummies = ", ".join(
        f"CAST(isodow(ds) - 1 = {v} AS INTEGER) AS dayofweek_{v}" for v in range(7)
    )
    o["date_features_all"] = (
        f"WITH {PANEL_SQL} SELECT unique_id, ds,"
        " CAST(isodow(ds) - 1 AS INTEGER) AS dayofweek,"
        " CAST(MONTH(ds) AS INTEGER) AS month,"
        " CAST(QUARTER(ds) AS INTEGER) AS quarter,"
        " CAST(DAYOFYEAR(ds) AS INTEGER) AS dayofyear,"
        " CAST(ds = last_day(ds) AS INTEGER) AS is_month_end,"
        " CAST(DAY(last_day(ds)) AS INTEGER) AS daysinmonth,"
        f" {dow_dummies},"
        " ROUND(SIN(2 * PI() * t / 7), 6) + 0.0 AS sin1_7,"
        " ROUND(COS(2 * PI() * t / 7), 6) + 0.0 AS cos1_7,"
        " CAST(t AS DOUBLE) AS trend"
        " FROM (SELECT *, ROW_NUMBER() OVER ("
        "  PARTITION BY unique_id ORDER BY ds) AS t FROM panel)"
    )

    o["expanding_mean"] = (
        f"WITH {PANEL_SQL}, qpanel AS (SELECT unique_id, ds, {QUANT_SQL} AS y"
        " FROM panel), aggs AS ("
        " SELECT unique_id, ds, SUM(y) OVER w AS w_sum, SUM(y*y) OVER w AS w_sum_sq,"
        "  COUNT(y) OVER w AS w_cnt FROM qpanel"
        " WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds,"
        "  ROUND(CASE WHEN w_cnt > 0 THEN w_sum * 1.0 / w_cnt END, 6) AS em,"
        "  ROUND(CASE WHEN w_cnt > 1 THEN"
        "   SQRT(GREATEST((w_sum_sq - w_sum * w_sum * 1.0 / w_cnt) / (w_cnt - 1), 0.0))"
        "  END, 6) AS es"
        " FROM aggs"
    )
    o["expanding_min_max"] = (
        f"WITH {PANEL_SQL}, aggs AS ("
        " SELECT unique_id, ds, MIN(y) OVER w AS w_min, MAX(y) OVER w AS w_max,"
        "  COUNT(y) OVER w AS w_cnt FROM panel"
        " WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds,"
        "  ROUND(CASE WHEN w_cnt > 0 THEN w_min END, 6) AS emin,"
        "  ROUND(CASE WHEN w_cnt > 0 THEN w_max END, 6) AS emax"
        " FROM aggs"
    )
    o["expanding_quantile"] = _expanding_sql(
        "quantile_cont(y, 0.25) OVER w AS w_q, COUNT(y) OVER w AS w_cnt",
        "CASE WHEN w_cnt > 0 THEN w_q END",
        1,
        "eq",
    )

    # seasonal: same-phase ROWS window over the lag-shifted series
    o["seasonal_rolling_mean_std"] = (
        f"WITH {PANEL_SQL}, qpanel AS (SELECT unique_id, ds, {QUANT_SQL} AS y"
        " FROM panel), base AS ("
        " SELECT unique_id, ds,"
        "  ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS ord,"
        "  LAG(y, 1) OVER (PARTITION BY unique_id ORDER BY ds) AS ly"
        " FROM qpanel), aggs AS ("
        " SELECT unique_id, ds, AVG(ly) OVER w AS w_avg, SUM(ly) OVER w AS s,"
        "  SUM(ly*ly) OVER w AS sq, COUNT(ly) OVER w AS c"
        " FROM base WINDOW w AS (PARTITION BY unique_id, ord % 7 ORDER BY ds"
        "  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))"
        " SELECT unique_id, ds, "
        + _round6_repr("CASE WHEN c >= 1 THEN w_avg END")
        + " AS srm, "
        + _round6_repr(
            "CASE WHEN c >= 2 AND c > 1 THEN"
            " SQRT(GREATEST((sq - s * s * 1.0 / c) / (c - 1), 0.0)) END"
        )
        + " AS srs FROM aggs"
    )

    # EWM: array_agg of the preceding values + list_reduce recursion
    o["ewm"] = (
        f"WITH {PANEL_SQL}, qpanel AS (SELECT unique_id, ds, {QUANT_SQL} AS y"
        " FROM panel), aggs AS ("
        " SELECT unique_id, ds, array_agg(y) OVER ("
        "  PARTITION BY unique_id ORDER BY ds"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vals"
        " FROM qpanel)"
        " SELECT unique_id, ds, "
        + _round6_repr(
            "CASE WHEN COALESCE(len(vals), 0) > 0 THEN"
            " list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc) END"
        )
        + " AS ewm_val FROM aggs"
    )

    o["combine_ratio"] = (
        f"WITH {PANEL_SQL}, aggs AS ("
        " SELECT unique_id, ds,"
        "  SUM(y) OVER w7 AS s7, COUNT(y) OVER w7 AS c7,"
        "  SUM(y) OVER w28 AS s28, COUNT(y) OVER w28 AS c28"
        " FROM panel WINDOW"
        "  w7 AS (PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),"
        "  w28 AS (PARTITION BY unique_id ORDER BY ds ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, ROUND("
        "  (CASE WHEN c7 >= 1 THEN s7 * 1.0 / c7 END) /"
        "  (CASE WHEN c28 >= 1 THEN s28 * 1.0 / c28 END), 6) AS ratio"
        " FROM aggs"
    )


    # pooled global + time_agg sum: collapse per global ordinal, window, join back
    o["pooled_global_rolling_mean"] = (
        f"WITH {PANEL_SQL}, qpanel AS ("
        f" SELECT unique_id, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, ds, y, DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT ord, SUM(y) AS y FROM base GROUP BY ord),"
        " aggs AS (SELECT ord, SUM(y) OVER w AS w_sum, COUNT(y) OVER w AS w_cnt"
        "  FROM collapsed WINDOW w AS (ORDER BY ord"
        "   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))"
        " SELECT b.unique_id, b.ds,"
        "  ROUND(CASE WHEN a.w_cnt >= 7 THEN a.w_sum * 1.0 / a.w_cnt END, 6) AS pgrm"
        " FROM base b LEFT JOIN aggs a ON b.ord = a.ord"
    )

    # pooled seasonal (global + time_agg sum): value at global ordinal o
    # averages the collapsed per-date sums at o-7-i*7, i in 0..3. The global
    # calendar is dense, so an anchor stat per phase + exact-ordinal delivery
    # reproduces the phase-keyed join. Quantized ys keep sums exact; /4 is a
    # power-of-two division so the mean is bit-identical across engines.
    o["pooled_seasonal_rolling_mean"] = (
        f"WITH {PANEL_SQL}, qpanel AS ("
        f" SELECT unique_id, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, ds, y, DENSE_RANK() OVER (ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT ord, SUM(y) AS v FROM base GROUP BY ord),"
        " anchor AS (SELECT ord, SUM(v) OVER w AS wsum, COUNT(v) OVER w AS wcnt"
        "  FROM collapsed WINDOW w AS (PARTITION BY ord % 7 ORDER BY ord"
        "   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))"
        " SELECT b.unique_id, b.ds,"
        "  ROUND(CASE WHEN a.wcnt >= 4 THEN a.wsum * 1.0 / a.wcnt END, 6) AS psrm"
        " FROM base b LEFT JOIN anchor a ON a.ord = b.ord - 7"
    )

    # pooled seasonal groupby (row-level samples): per-region calendar
    # ordinals; min_samples counts rows across series (default window_size=2)
    o["pooled_groupby_seasonal_rolling_mean"] = (
        f"WITH {PANEL_REGION_SQL}, qpanel AS ("
        f" SELECT unique_id, region, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, region, ds, y,"
        "  DENSE_RANK() OVER (PARTITION BY region ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT region, ord, SUM(y) AS s, COUNT(y) AS c"
        "  FROM base GROUP BY 1, 2),"
        " anchor AS (SELECT region, ord, SUM(s) OVER w AS wsum, SUM(c) OVER w AS wcnt"
        "  FROM collapsed WINDOW w AS (PARTITION BY region, ord % 7 ORDER BY ord"
        "   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW))"
        " SELECT b.unique_id, b.ds,"
        "  ROUND(CASE WHEN a.wcnt >= 2 THEN a.wsum * 1.0 / a.wcnt END, 6) AS pgsrm"
        " FROM base b LEFT JOIN anchor a"
        "  ON a.region = b.region AND a.ord = b.ord - 7"
    )

    # pooled groupby (row-level samples): window over all region rows by ordinal
    o["pooled_groupby_expanding_mean"] = (
        f"WITH {PANEL_REGION_SQL}, qpanel AS ("
        f" SELECT unique_id, region, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, region, ds, y,"
        "  DENSE_RANK() OVER (PARTITION BY region ORDER BY ds) - 1 AS ord FROM qpanel),"
        " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS w_sum, COUNT(y) OVER w AS w_cnt"
        "  FROM base WINDOW w AS (PARTITION BY region ORDER BY ord"
        "   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds,"
        "  ROUND(CASE WHEN w_cnt > 0 THEN w_sum * 1.0 / w_cnt END, 6) AS pgem"
        " FROM aggs"
    )

    # pooled local partition mode: parent ordinal per id, bucket (id, is_weekend)
    o["pooled_partition_rolling_mean"] = (
        f"WITH {PANEL_SQL}, qpanel AS ("
        f" SELECT unique_id, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, ds, y,"
        "  CAST(isodow(ds) - 1 >= 5 AS INTEGER) AS is_weekend,"
        "  DENSE_RANK() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS ord FROM qpanel),"
        " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS w_sum, COUNT(y) OVER w AS w_cnt"
        "  FROM base WINDOW w AS (PARTITION BY unique_id, is_weekend ORDER BY ord"
        "   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds,"
        "  ROUND(CASE WHEN w_cnt >= 1 THEN w_sum * 1.0 / w_cnt END, 6) AS pprm"
        " FROM aggs"
    )

    # pooled groupby + time_agg mean: collapse per (region, ord) then join back
    o["pooled_groupby_timeagg_rolling_mean"] = (
        f"WITH {PANEL_REGION_SQL}, qpanel AS ("
        f" SELECT unique_id, region, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, region, ds, y,"
        "  DENSE_RANK() OVER (PARTITION BY region ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT region, ord, AVG(y) AS y FROM base GROUP BY region, ord),"
        " aggs AS (SELECT region, ord, SUM(y) OVER w AS w_sum, COUNT(y) OVER w AS w_cnt"
        "  FROM collapsed WINDOW w AS (PARTITION BY region ORDER BY ord"
        "   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))"
        " SELECT b.unique_id, b.ds,"
        "  ROUND(CASE WHEN a.w_cnt >= 7 THEN a.w_sum * 1.0 / a.w_cnt END, 6) AS pgtrm"
        " FROM base b LEFT JOIN aggs a ON b.region = a.region AND b.ord = a.ord"
    )

    o["global_log1p"] = (
        f"WITH {PANEL_SQL} SELECT unique_id, ds, ROUND(LN(1 + y), 6) AS y_log FROM panel"
    )

    o["pooled_partition_expanding_mean"] = (
        f"WITH {PANEL_SQL}, qpanel AS ("
        f" SELECT unique_id, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, ds, y,"
        "  CAST(isodow(ds) - 1 >= 5 AS INTEGER) AS is_weekend,"
        "  DENSE_RANK() OVER (PARTITION BY unique_id ORDER BY ds) - 1 AS ord FROM qpanel),"
        " aggs AS (SELECT unique_id, ds, SUM(y) OVER w AS s, COUNT(y) OVER w AS c FROM base"
        "  WINDOW w AS (PARTITION BY unique_id, is_weekend ORDER BY ord"
        "   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, ROUND(CASE WHEN c > 0 THEN s * 1.0 / c END, 6) AS ppem"
        " FROM aggs"
    )

    # pooled EWM: recursion over per-(region, ord) means via list_reduce
    o["pooled_groupby_ewm"] = (
        f"WITH {PANEL_REGION_SQL}, qpanel AS ("
        f" SELECT unique_id, region, ds, {QUANT_SQL} AS y FROM panel), base AS ("
        " SELECT unique_id, region, ds, y,"
        "  DENSE_RANK() OVER (PARTITION BY region ORDER BY ds) - 1 AS ord FROM qpanel),"
        " collapsed AS (SELECT region, ord, AVG(y) AS y FROM base GROUP BY region, ord),"
        " aggs AS (SELECT region, ord, array_agg(y) OVER ("
        "  PARTITION BY region ORDER BY ord"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vals FROM collapsed)"
        " SELECT b.unique_id, b.ds, "
        + _round6_repr(
            "CASE WHEN COALESCE(len(a.vals), 0) > 0 THEN"
            " list_reduce(a.vals, (acc, x) -> 0.4 * x + 0.6 * acc) END"
        )
        + " AS pgewm"
        " FROM base b LEFT JOIN aggs a ON b.region = a.region AND b.ord = a.ord"
    )

    o["embedding_near_dups"] = (
        "WITH pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        "  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "   CAST(b.embedding AS DOUBLE[])), 6) AS cosine"
        "  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),"
        " ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)"
        " SELECT query_id, neighbor_id, cosine FROM ranked"
        " WHERE rank <= 3 AND cosine >= 0.35"
    )

    # connected components of the near-dup pair graph via recursive
    # reachability (enumerates (src, reachable) pairs — fine at oracle scale,
    # while the Spark side runs the O(log d)-round label-propagation plan)
    o["dedup_clusters"] = (
        "WITH RECURSIVE pairs AS ("
        " SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        "  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "   CAST(b.embedding AS DOUBLE[])), 6) AS cosine"
        "  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),"
        " nd AS (SELECT query_id, neighbor_id FROM ("
        "  SELECT query_id, neighbor_id, cosine, ROW_NUMBER() OVER ("
        "   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank"
        "  FROM pairs) WHERE rank <= 3 AND cosine >= 0.35),"
        " e AS (SELECT query_id AS u, neighbor_id AS v FROM nd"
        "  UNION SELECT neighbor_id, query_id FROM nd),"
        " nodes AS (SELECT DISTINCT u AS id FROM e),"
        " reach(src, node) AS ("
        "  SELECT id, id FROM nodes"
        "  UNION"
        "  SELECT r.src, e.v FROM reach r JOIN e ON e.u = r.node),"
        " labels AS (SELECT src AS node_id, MIN(node) AS cluster_id"
        "  FROM reach GROUP BY src)"
        " SELECT node_id, cluster_id,"
        "  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM labels"
    )

    o["stratified_sample_docs"] = (
        "SELECT lang, doc_id, sample_rank FROM ("
        " SELECT lang, doc_id, ROW_NUMBER() OVER ("
        "  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))"
        " ) AS sample_rank FROM documents)"
        " WHERE sample_rank <= 20"
    )
    # mirror of operators/sampling.mixture_sample: per-domain keep fraction
    # w*T/n with T = min(n/w), cutoff = round(frac * 16^6) as 6 lowercase hex
    # chars, rows kept when the md5(doc_id) prefix sorts below it ('g' = all)
    o["mixture_sample_docs"] = (
        "WITH w AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.25),"
        "  ('fr', 0.125), ('zh', 0.125)) AS t(lang, wt)),"
        " c AS (SELECT d.lang, wt, COUNT(*) AS n FROM documents d"
        "  JOIN w ON d.lang = w.lang GROUP BY d.lang, wt),"
        " tt AS (SELECT MIN(n / wt) AS t FROM c),"
        " cut AS (SELECT lang, CASE WHEN (wt * t) / n >= 1.0 THEN 'g'"
        "  ELSE printf('%06x', CAST(round(LEAST(1.0, (wt * t) / n) * 16777216)"
        "   AS BIGINT)) END AS cutoff FROM c, tt)"
        " SELECT d.doc_id, d.lang FROM documents d JOIN cut ON d.lang = cut.lang"
        " WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < cutoff"
    )
    # mirror of operators/lm.py: bigram Stupid Backoff trained on even
    # doc_ids, scoring odd doc_ids. Same tokenization (lower + \s+ split,
    # empties dropped), same cascade and float-op order; DuckDB joins on
    # gram STRINGS where Spark joins on xxhash64(gram) - equivalent absent
    # 64-bit collisions
    o["doc_lm_score"] = (
        "WITH tk AS (SELECT doc_id,"
        "  list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        "   x -> len(x) > 0) AS toks FROM documents),"
        " tr AS (SELECT toks FROM tk WHERE doc_id % 2 = 0),"
        " uni AS (SELECT u.g, COUNT(*) AS c FROM ("
        "  SELECT unnest(toks) AS g FROM tr) u GROUP BY u.g),"
        " tot AS (SELECT COUNT(*) AS n FROM (SELECT unnest(toks) FROM tr)),"
        " bi AS (SELECT b.g, COUNT(*) AS c FROM ("
        "  SELECT unnest(list_transform("
        "   generate_series(1, greatest(len(toks) - 1, 0)),"
        "   i -> toks[i] || chr(31) || toks[i + 1])) AS g FROM tr) b"
        "  GROUP BY b.g),"
        " pos AS (SELECT doc_id, s.i, toks[s.i] AS w,"
        "  CASE WHEN s.i >= 2 THEN toks[s.i - 1] END AS prev,"
        "  CASE WHEN s.i >= 2 THEN toks[s.i - 1] || chr(31) || toks[s.i] END AS bg"
        "  FROM (SELECT doc_id, toks FROM tk"
        "   WHERE doc_id % 2 = 1 AND len(toks) > 0) t,"
        "  LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS i) s),"
        " sc AS (SELECT doc_id,"
        "  COALESCE("
        "   CASE WHEN i >= 2 THEN"
        "    CASE WHEN bc.c IS NOT NULL AND pc.c IS NOT NULL"
        "     THEN bc.c * 1.0 / pc.c"
        "     ELSE 0.4 * (uc.c * 1.0 / (SELECT n FROM tot)) END"
        "   ELSE uc.c * 1.0 / (SELECT n FROM tot) END,"
        "   0.5 / (SELECT n FROM tot)) AS s"
        "  FROM pos"
        "  LEFT JOIN uni uc ON pos.w = uc.g"
        "  LEFT JOIN uni pc ON pos.prev = pc.g"
        "  LEFT JOIN bi bc ON pos.bg = bc.g)"
        " SELECT doc_id, COUNT(*) AS n_scored_tokens,"
        "  ROUND(AVG(log10(s)), 6) AS avg_logprob"
        " FROM sc GROUP BY doc_id"
    )
    # mirror of operators/packing.pack_sequences(mode='concat', num_shards=1):
    # docs laid end to end in md5 order, stream cut every 1000 tokens
    o["pack_concat_docs"] = (
        "WITH base AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS nt,"
        "  md5(CAST(doc_id AS VARCHAR)) AS ord FROM documents WHERE n_chars > 0),"
        " c AS (SELECT doc_id, nt,"
        "  SUM(nt) OVER (ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND"
        "   CURRENT ROW) - nt AS st FROM base),"
        " e AS (SELECT doc_id, nt, st, UNNEST(generate_series("
        "  CAST(FLOOR(st / 1000) AS BIGINT),"
        "  CAST(FLOOR((st + nt - 1) / 1000) AS BIGINT))) AS seq FROM c)"
        " SELECT doc_id, CAST(0 AS INTEGER) AS shard, seq, seq AS seq_id,"
        "  CAST(GREATEST(st, seq * 1000) - seq * 1000 AS INTEGER) AS offset_in_seq,"
        "  CAST(GREATEST(st, seq * 1000) - st AS INTEGER) AS doc_start,"
        "  CAST(LEAST(st + nt, (seq + 1) * 1000) - GREATEST(st, seq * 1000)"
        "   AS INTEGER) AS slice_tokens"
        " FROM e"
    )

    o["differences"] = (
        f"WITH {PANEL_SQL} SELECT unique_id, ds,"
        " ROUND(y - LAG(y, 1) OVER (PARTITION BY unique_id ORDER BY ds), 6) AS y_diff"
        " FROM panel"
    )

    # AutoDifferences(max_diffs=2): per-series d from the variance-ratio
    # criterion (target_transforms.py _ndiffs: keep differencing while
    # var_pop(diff) < 0.95 * var_pop(cur), with the same length guards)
    o["auto_differences"] = (
        f"WITH {PANEL_SQL}, d1 AS ("
        " SELECT unique_id, ds, y,"
        "  y - LAG(y) OVER (PARTITION BY unique_id ORDER BY ds) AS dy1"
        " FROM panel),"
        " diffs AS ("
        " SELECT unique_id, ds, y, dy1,"
        "  dy1 - LAG(dy1) OVER (PARTITION BY unique_id ORDER BY ds) AS dy2"
        " FROM d1),"
        " stats AS ("
        " SELECT unique_id, COUNT(*) AS n, var_pop(y) AS v0,"
        "  var_pop(dy1) AS v1, var_pop(dy2) AS v2"
        " FROM diffs GROUP BY unique_id),"
        " choice AS ("
        " SELECT unique_id,"
        "  CASE WHEN n >= 4 AND v0 > 0 AND v1 < 0.95 * v0 THEN"
        "   CASE WHEN n >= 5 AND v1 > 0 AND v2 < 0.95 * v1 THEN 2 ELSE 1 END"
        "  ELSE 0 END AS d"
        " FROM stats)"
        " SELECT d.unique_id, d.ds,"
        "  ROUND(CASE c.d WHEN 0 THEN d.y WHEN 1 THEN d.dy1 ELSE d.dy2 END, 6) AS y_ad"
        " FROM diffs d JOIN choice c ON d.unique_id = c.unique_id"
    )

    # LocalBoxCox: per-series lambda by grid MLE (target_transforms.py
    # fit_lambda: 61-point linspace(-1, 2), ll = -n/2*ln(var_pop(z)) +
    # (lmb-1)*sum(ln y), first-best tie-break). The grid replicates numpy
    # linspace exactly: i*step + start with the endpoint forced to 2.0.
    o["local_boxcox"] = (
        f"WITH {PANEL_SQL}, grid AS ("
        " SELECT CASE WHEN i = 60 THEN 2.0 ELSE i * (3.0 / 60.0) + (-1.0) END AS lmb"
        " FROM range(61) t(i)),"
        " stats AS ("
        " SELECT unique_id, lmb,"
        "  CASE WHEN ABS(lmb) < 1e-12 THEN var_pop(ln(y))"
        "   ELSE var_pop((POWER(y, lmb) - 1.0) / lmb) END AS v,"
        "  SUM(ln(y)) AS slog, COUNT(*) AS n, BOOL_AND(y > 0) AS pos"
        " FROM panel CROSS JOIN grid GROUP BY unique_id, lmb),"
        " ll AS ("
        " SELECT unique_id, lmb,"
        "  CASE WHEN pos AND n > 2 AND v > 0"
        "   THEN -0.5 * n * ln(v) + (lmb - 1.0) * slog END AS ll"
        " FROM stats),"
        " best AS ("
        " SELECT unique_id, COALESCE(arg_max(lmb, ll ORDER BY ll DESC, lmb ASC), 1.0) AS lmb"
        " FROM ll WHERE ll IS NOT NULL GROUP BY unique_id)"
        " SELECT p.unique_id, p.ds,"
        "  ROUND(CASE WHEN ABS(b.lmb) < 1e-12 THEN ln(p.y)"
        "   ELSE (POWER(p.y, b.lmb) - 1.0) / b.lmb END, 6) AS y_bc"
        " FROM panel p JOIN best b ON p.unique_id = b.unique_id"
    )

    o["local_scalers"] = (
        f"WITH {PANEL_SQL}, stats AS ("
        " SELECT unique_id, AVG(y) AS mu,"
        "  CASE WHEN stddev_pop(y) = 0 THEN 1.0 ELSE stddev_pop(y) END AS sigma,"
        "  MIN(y) AS lo,"
        "  CASE WHEN MAX(y) - MIN(y) = 0 THEN 1.0 ELSE MAX(y) - MIN(y) END AS rng,"
        "  quantile_cont(y, 0.5) AS med,"
        "  CASE WHEN quantile_cont(y, 0.75) - quantile_cont(y, 0.25) = 0 THEN 1.0"
        "   ELSE quantile_cont(y, 0.75) - quantile_cont(y, 0.25) END AS iqr"
        " FROM panel GROUP BY 1)"
        " SELECT p.unique_id, p.ds,"
        "  ROUND((p.y - s.mu) / s.sigma, 6) AS y_z,"
        "  ROUND((p.y - s.lo) / s.rng, 6) AS y_mm,"
        "  ROUND((p.y - s.med) / s.iqr, 6) AS y_r"
        " FROM panel p JOIN stats s ON p.unique_id = s.unique_id"
    )

    # --- documents -----------------------------------------------------
    o["doc_text_profile"] = _text_profile_quality_sql()

    o["dedup_exact"] = (
        "WITH parts AS (SELECT doc_id, string_split(text, ' ') AS p FROM documents),"
        " lines AS (SELECT doc_id, generate_subscripts(p, 1) AS pos,"
        "  unnest(p) AS para FROM parts),"
        " marked AS (SELECT doc_id, pos, para,"
        "  CASE WHEN length(trim(para)) >= 1 THEN"
        "   row_number() OVER (PARTITION BY para ORDER BY doc_id, pos)"
        "  ELSE 0 END AS rn FROM lines),"
        " rebuilt AS (SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS ctext"
        "  FROM marked WHERE rn <= 1 GROUP BY doc_id)"
        " SELECT d.doc_id, md5(d.text) AS content_hash,"
        " MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS canonical_id,"
        " COUNT(*) OVER (PARTITION BY md5(d.text)) AS dup_count,"
        " md5(COALESCE(r.ctext, '')) AS para_clean_md5,"
        " length(COALESCE(r.ctext, '')) AS para_clean_chars"
        " FROM documents d LEFT JOIN rebuilt r USING (doc_id)"
    )

    o["dedup_ngram_jaccard"] = (
        "WITH toks AS (SELECT doc_id, lang, source,"
        "  string_split_regex(TRIM(LOWER(text)), '\\s+') AS t FROM documents),"
        " sh AS (SELECT DISTINCT doc_id, lang, source,"
        "  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle"
        "  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)"
        "  WHERE len(t) >= 3),"
        " sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),"
        " inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter"
        "  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang"
        "   AND a.source = b.source AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2)"
        " SELECT id_a, id_b,"
        "  ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard"
        " FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id"
        " WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2"
    )

    # exact all-pairs Jaccard >= 0.3, NO blocking: equals the LSH-verified
    # Spark result only while minhash recall at 0.3 stays 100%
    o["dedup_minhash_verified"] = (
        "WITH toks AS (SELECT doc_id,"
        "  string_split_regex(TRIM(LOWER(text)), '\\s+') AS t FROM documents),"
        " sh AS (SELECT DISTINCT doc_id,"
        "  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle"
        "  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)"
        "  WHERE len(t) >= 3),"
        " sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),"
        " inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter"
        "  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2)"
        " SELECT id_a, id_b,"
        "  ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard"
        " FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id"
        " WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.3"
    )

    # recursive engine closed form: yhat(step i) = y at row position
    # n - 7*ceil(i/7) + i (positional, so history gaps match the engine's
    # row-based lag); forecast dates are last_ds + i calendar days
    o["predict_snaive_gbt"] = (
        f"WITH {PANEL_SQL}, nums AS ("
        " SELECT unique_id, ds, y,"
        "  ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) AS rn,"
        "  COUNT(*) OVER (PARTITION BY unique_id) AS n,"
        "  MAX(ds) OVER (PARTITION BY unique_id) AS last_ds"
        " FROM panel),"
        " series AS (SELECT DISTINCT unique_id, n, last_ds FROM nums),"
        " steps AS (SELECT unique_id, n, last_ds,"
        "  unnest(generate_series(1, 10)) AS i FROM series),"
        # GBT per-weekday boosting closed form on the order-count panel:
        # c_m = c_{m-1} + lr*(S - n*c_{m-1})/(n + lambda), c_0 = mean(y),
        # unrolled for n_estimators=3, lr=0.5, reg_lambda=1
        " cpanel AS ("
        " SELECT n_name AS unique_id, CAST(o_orderdate AS DATE) AS ds,"
        "        CAST(COUNT(*) AS DOUBLE) AS y"
        " FROM orders, customer, nation"
        " WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey"
        " GROUP BY 1, 2),"
        " cbase AS (SELECT AVG(y) AS c0 FROM cpanel),"
        " g AS (SELECT dayofweek(ds) AS dow, SUM(y) AS s, COUNT(*) AS n"
        "       FROM cpanel GROUP BY 1),"
        " it AS ("
        "  SELECT dow, c2 + 0.5*(s - n*c2)/(n + 1.0) AS c3 FROM ("
        "   SELECT dow, s, n, c1 + 0.5*(s - n*c1)/(n + 1.0) AS c2 FROM ("
        "    SELECT dow, s, n,"
        "     (SELECT c0 FROM cbase) + 0.5*(s - n*(SELECT c0 FROM cbase))/(n + 1.0) AS c1"
        "    FROM g))),"
        " clast AS (SELECT unique_id, MAX(ds) AS last_ds FROM cpanel GROUP BY 1),"
        " cfut AS (SELECT unique_id, CAST(unnest(generate_series("
        "   CAST(last_ds AS TIMESTAMP) + INTERVAL 1 DAY,"
        "   CAST(last_ds AS TIMESTAMP) + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS ds"
        "  FROM clast),"
        # single-feature OLS closed form: integer count panel -> all
        # normal-equation sums fp-exact, so the explicit Cramer solution
        # matches the engine's Gram solve far below round(6)
        " cnums AS (SELECT unique_id, ds, y,"
        "  ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) AS rn,"
        "  COUNT(*) OVER (PARTITION BY unique_id) AS n,"
        "  MAX(ds) OVER (PARTITION BY unique_id) AS last_ds"
        " FROM cpanel),"
        " lpairs AS (SELECT a.y AS yv, b.y AS xv FROM cnums a JOIN cnums b"
        "  ON a.unique_id = b.unique_id AND b.rn = a.rn - 7),"
        " lstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(xv) AS sx,"
        "  SUM(yv) AS sy, SUM(xv*yv) AS sxy, SUM(xv*xv) AS sxx FROM lpairs),"
        " lcoef AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b,"
        "  (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS a FROM lstats),"
        " lsteps AS (SELECT unique_id, n, last_ds,"
        "  unnest(generate_series(1, 10)) AS i"
        "  FROM (SELECT DISTINCT unique_id, n, last_ds FROM cnums)),"
        " lp1 AS (SELECT s.unique_id, s.i, s.last_ds, c.a + c.b * v.y AS yhat"
        "  FROM lsteps s JOIN cnums v ON v.unique_id = s.unique_id"
        "   AND v.rn = s.n + s.i - 7, lcoef c WHERE s.i <= 7),"
        # steps 8-10 feed back the rollout's own step-(i-7) predictions
        " lp2 AS (SELECT p.unique_id, p.i + 7 AS i, p.last_ds,"
        "  c.a + c.b * p.yhat AS yhat FROM lp1 p, lcoef c WHERE p.i <= 3),"
        " lpred AS (SELECT * FROM lp1 UNION ALL SELECT * FROM lp2)"
        " SELECT 'snaive' AS model, s.unique_id,"
        "  CAST(CAST(s.last_ds AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "  ROUND(v.y, 6) AS yhat"
        " FROM steps s JOIN nums v ON v.unique_id = s.unique_id"
        "  AND v.rn = s.n - 7 * CAST(CEIL(i / 7.0) AS INT) + i"
        " UNION ALL"
        # the cogrouped engine shares the loop's closed form exactly
        " SELECT 'snaive_cogroup' AS model, s.unique_id,"
        "  CAST(CAST(s.last_ds AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "  ROUND(v.y, 6) AS yhat"
        " FROM steps s JOIN nums v ON v.unique_id = s.unique_id"
        "  AND v.rn = s.n - 7 * CAST(CEIL(i / 7.0) AS INT) + i"
        " UNION ALL"
        " SELECT 'gbt' AS model, f.unique_id, f.ds, ROUND(it.c3, 6) AS yhat"
        " FROM cfut f JOIN it ON dayofweek(f.ds) = it.dow"
        " UNION ALL"
        " SELECT 'linreg' AS model, unique_id,"
        "  CAST(CAST(last_ds AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "  ROUND(yhat, 6) AS yhat FROM lpred"
    )

    # CV closed form: per window (backs 14, 7 days), predictions are the
    # train span's last-7 positional values mapped onto train_last + i days;
    # valid rows are observed rows in (cutoff, cutoff + 7 days]
    o["cross_validation_snaive"] = (
        f"WITH {PANEL_SQL},"
        " m AS (SELECT unique_id, MAX(ds) AS max_ds FROM panel GROUP BY 1),"
        " cut AS (SELECT unique_id, CAST(CAST(max_ds AS TIMESTAMP)"
        "   - back * INTERVAL 1 DAY AS DATE) AS cutoff"
        "  FROM m, UNNEST([14, 7]) AS t(back)),"
        " train AS (SELECT c.unique_id, c.cutoff, p.ds, p.y,"
        "   ROW_NUMBER() OVER (PARTITION BY c.unique_id, c.cutoff ORDER BY p.ds) AS rn,"
        "   COUNT(*) OVER (PARTITION BY c.unique_id, c.cutoff) AS n,"
        "   MAX(p.ds) OVER (PARTITION BY c.unique_id, c.cutoff) AS tl"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id AND p.ds <= c.cutoff),"
        " spans AS (SELECT DISTINCT unique_id, cutoff, n, tl FROM train),"
        " steps AS (SELECT unique_id, cutoff, n, tl,"
        "  unnest(generate_series(1, 7)) AS i FROM spans),"
        " preds AS (SELECT s.unique_id, s.cutoff,"
        "   CAST(CAST(s.tl AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "   t.y AS yhat"
        "  FROM steps s JOIN train t ON t.unique_id = s.unique_id"
        "   AND t.cutoff = s.cutoff AND t.rn = s.n - 7 + s.i),"
        " valid AS (SELECT c.unique_id, c.cutoff, p.ds, p.y"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id"
        "   AND p.ds > c.cutoff"
        "   AND p.ds <= CAST(CAST(c.cutoff AS TIMESTAMP) + 7 * INTERVAL 1 DAY AS DATE))"
        " SELECT v.unique_id, v.ds, v.cutoff, ROUND(v.y, 6) AS y,"
        "  ROUND(pr.yhat, 6) AS yhat"
        " FROM valid v JOIN preds pr ON pr.unique_id = v.unique_id"
        "  AND pr.cutoff = v.cutoff AND pr.ds = v.ds"
    )

    # conformal_error closed form: backtest scores |y - yhat| from the CV
    # closed form, step = row_number within (series, cutoff), q = 0.8
    # quantile per (series, step), interval = prediction -/+ q (LEFT join:
    # steps with no calibration scores stay null, like the engine)
    o["conformal_snaive"] = (
        f"WITH {PANEL_SQL},"
        " m AS (SELECT unique_id, MAX(ds) AS max_ds FROM panel GROUP BY 1),"
        " cut AS (SELECT unique_id, CAST(CAST(max_ds AS TIMESTAMP)"
        "   - back * INTERVAL 1 DAY AS DATE) AS cutoff"
        "  FROM m, UNNEST([14, 7]) AS t(back)),"
        " train AS (SELECT c.unique_id, c.cutoff, p.ds, p.y,"
        "   ROW_NUMBER() OVER (PARTITION BY c.unique_id, c.cutoff ORDER BY p.ds) AS rn,"
        "   COUNT(*) OVER (PARTITION BY c.unique_id, c.cutoff) AS n,"
        "   MAX(p.ds) OVER (PARTITION BY c.unique_id, c.cutoff) AS tl"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id AND p.ds <= c.cutoff),"
        " spans AS (SELECT DISTINCT unique_id, cutoff, n, tl FROM train),"
        " steps AS (SELECT unique_id, cutoff, n, tl,"
        "  unnest(generate_series(1, 7)) AS i FROM spans),"
        " wpreds AS (SELECT s.unique_id, s.cutoff,"
        "   CAST(CAST(s.tl AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "   t.y AS yhat"
        "  FROM steps s JOIN train t ON t.unique_id = s.unique_id"
        "   AND t.cutoff = s.cutoff AND t.rn = s.n - 7 + s.i),"
        " valid AS (SELECT c.unique_id, c.cutoff, p.ds, p.y"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id"
        "   AND p.ds > c.cutoff"
        "   AND p.ds <= CAST(CAST(c.cutoff AS TIMESTAMP) + 7 * INTERVAL 1 DAY AS DATE)),"
        " cv AS (SELECT v.unique_id, v.cutoff, v.ds, v.y, pr.yhat"
        "  FROM valid v JOIN wpreds pr ON pr.unique_id = v.unique_id"
        "   AND pr.cutoff = v.cutoff AND pr.ds = v.ds),"
        " scores AS (SELECT unique_id, ABS(y - yhat) AS s,"
        "   ROW_NUMBER() OVER (PARTITION BY unique_id, cutoff ORDER BY ds) AS step"
        "  FROM cv),"
        " qs AS (SELECT unique_id, step, quantile_cont(s, 0.8) AS q"
        "  FROM scores GROUP BY 1, 2),"
        " full_nums AS (SELECT unique_id, ds, y,"
        "   ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) AS rn,"
        "   COUNT(*) OVER (PARTITION BY unique_id) AS n,"
        "   MAX(ds) OVER (PARTITION BY unique_id) AS last_ds"
        "  FROM panel),"
        " fser AS (SELECT DISTINCT unique_id, n, last_ds FROM full_nums),"
        " fsteps AS (SELECT unique_id, n, last_ds,"
        "  unnest(generate_series(1, 7)) AS i FROM fser),"
        " fpreds AS (SELECT s.unique_id, s.i AS step,"
        "   CAST(CAST(s.last_ds AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "   v.y AS yhat"
        "  FROM fsteps s JOIN full_nums v ON v.unique_id = s.unique_id"
        "   AND v.rn = s.n - 7 + s.i)"
        " SELECT f.unique_id, f.ds, ROUND(f.yhat, 6) AS yhat,"
        "  ROUND(f.yhat - q.q, 6) AS lo, ROUND(f.yhat + q.q, 6) AS hi"
        " FROM fpreds f LEFT JOIN qs q ON q.unique_id = f.unique_id"
        "  AND q.step = f.step"
    )

    # conformal_distribution closed form: same backtest scores as
    # conformal_error, but the interval bounds are quantiles of the
    # SYMMETRIC score union {+s, -s} added to the prediction
    # (lo = yhat + q10, hi = yhat + q90 at level 80)
    o["conformal_distribution_snaive"] = (
        f"WITH {PANEL_SQL},"
        " m AS (SELECT unique_id, MAX(ds) AS max_ds FROM panel GROUP BY 1),"
        " cut AS (SELECT unique_id, CAST(CAST(max_ds AS TIMESTAMP)"
        "   - back * INTERVAL 1 DAY AS DATE) AS cutoff"
        "  FROM m, UNNEST([14, 7]) AS t(back)),"
        " train AS (SELECT c.unique_id, c.cutoff, p.ds, p.y,"
        "   ROW_NUMBER() OVER (PARTITION BY c.unique_id, c.cutoff ORDER BY p.ds) AS rn,"
        "   COUNT(*) OVER (PARTITION BY c.unique_id, c.cutoff) AS n,"
        "   MAX(p.ds) OVER (PARTITION BY c.unique_id, c.cutoff) AS tl"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id AND p.ds <= c.cutoff),"
        " spans AS (SELECT DISTINCT unique_id, cutoff, n, tl FROM train),"
        " steps AS (SELECT unique_id, cutoff, n, tl,"
        "  unnest(generate_series(1, 7)) AS i FROM spans),"
        " wpreds AS (SELECT s.unique_id, s.cutoff,"
        "   CAST(CAST(s.tl AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "   t.y AS yhat"
        "  FROM steps s JOIN train t ON t.unique_id = s.unique_id"
        "   AND t.cutoff = s.cutoff AND t.rn = s.n - 7 + s.i),"
        " valid AS (SELECT c.unique_id, c.cutoff, p.ds, p.y"
        "  FROM cut c JOIN panel p ON p.unique_id = c.unique_id"
        "   AND p.ds > c.cutoff"
        "   AND p.ds <= CAST(CAST(c.cutoff AS TIMESTAMP) + 7 * INTERVAL 1 DAY AS DATE)),"
        " cv AS (SELECT v.unique_id, v.cutoff, v.ds, v.y, pr.yhat"
        "  FROM valid v JOIN wpreds pr ON pr.unique_id = v.unique_id"
        "   AND pr.cutoff = v.cutoff AND pr.ds = v.ds),"
        " scores AS (SELECT unique_id, ABS(y - yhat) AS s,"
        "   ROW_NUMBER() OVER (PARTITION BY unique_id, cutoff ORDER BY ds) AS step"
        "  FROM cv),"
        " sym AS (SELECT unique_id, step, s AS v FROM scores"
        "  UNION ALL SELECT unique_id, step, -s AS v FROM scores),"
        " qs AS (SELECT unique_id, step, quantile_cont(v, 0.1) AS ql,"
        "   quantile_cont(v, 0.9) AS qh"
        "  FROM sym GROUP BY 1, 2),"
        " full_nums AS (SELECT unique_id, ds, y,"
        "   ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY ds) AS rn,"
        "   COUNT(*) OVER (PARTITION BY unique_id) AS n,"
        "   MAX(ds) OVER (PARTITION BY unique_id) AS last_ds"
        "  FROM panel),"
        " fser AS (SELECT DISTINCT unique_id, n, last_ds FROM full_nums),"
        " fsteps AS (SELECT unique_id, n, last_ds,"
        "  unnest(generate_series(1, 7)) AS i FROM fser),"
        " fpreds AS (SELECT s.unique_id, s.i AS step,"
        "   CAST(CAST(s.last_ds AS TIMESTAMP) + i * INTERVAL 1 DAY AS DATE) AS ds,"
        "   v.y AS yhat"
        "  FROM fsteps s JOIN full_nums v ON v.unique_id = s.unique_id"
        "   AND v.rn = s.n - 7 + s.i)"
        " SELECT f.unique_id, f.ds, ROUND(f.yhat, 6) AS yhat,"
        "  ROUND(f.yhat + q.ql, 6) AS lo, ROUND(f.yhat + q.qh, 6) AS hi"
        " FROM fpreds f LEFT JOIN qs q ON q.unique_id = f.unique_id"
        "  AND q.step = f.step"
    )

    o["events_tumbling_agg"] = (
        "SELECT event_type,"
        " CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ds,"
        " ROUND(SUM(value), 6) AS y"
        " FROM events GROUP BY 1, 2"
    )

    o["events_sessionize"] = (
        "WITH base AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),"
        " gaps AS (SELECT event_id, user_id,"
        "  epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap,"
        "  ts FROM base)"
        " SELECT event_id, user_id,"
        "  CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx"
        " FROM gaps"
    )

    o["transform_exog"] = (
        f"WITH {PANEL_SQL}, prices AS ("
        " SELECT unique_id, ds, y * 2 AS price FROM panel),"
        " aggs AS (SELECT unique_id, ds, price,"
        "  LAG(price, 1) OVER (PARTITION BY unique_id ORDER BY ds) AS pl,"
        "  SUM(price) OVER w AS s, COUNT(price) OVER w AS c"
        "  FROM prices WINDOW w AS (PARTITION BY unique_id ORDER BY ds"
        "   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))"
        " SELECT unique_id, ds, ROUND(price, 6) AS price, ROUND(pl, 6) AS price_lag1,"
        "  ROUND(CASE WHEN c >= 7 THEN s * 1.0 / c END, 6) AS price_rm7"
        " FROM aggs"
    )

    # full-probe IVF is exactly brute force — same oracle
    o["ann_ivf_topk"] = (
        "WITH pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        "  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "   CAST(b.embedding AS DOUBLE[])), 6) AS cosine"
        "  FROM embeddings a, embeddings b"
        "  WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id)"
        " SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
        "   ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)"
        " WHERE rank <= 10"
    )

    o["ann_cosine_topk"] = (
        "WITH pairs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        "  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        "   CAST(b.embedding AS DOUBLE[])), 6) AS cosine"
        "  FROM embeddings a, embeddings b"
        "  WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id)"
        " SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
        "   ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)"
        " WHERE rank <= 10"
    )

    return o
