"""Structured-Streaming adapters.

The reference's only streaming notion is the incremental ``update()``
micro-batch append (`/root/reference/mlforecast/core.py:2019-2113`;
SURVEY.md §2.10). Here that maps onto Structured Streaming directly:

- :func:`stream_update` — ``foreachBatch`` → ``MLForecast.update`` per
  micro-batch; the engine's inferred ``keep_last_n`` tail bound plays the
  watermark's role (state retention).
- :func:`tumbling_aggregate` — watermarked tumbling-window aggregation of an
  event stream into a panel (the ``time_agg`` concept on a live stream).
- :func:`stream_score` — per-batch scoring with the fitted models' JVM
  expressions (no Python in the stream).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .local_predict import CogroupUnsupportedError


def _committed_batch_dirs_exist(spark, path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED per-batch parquet
    directory (``batch_id=*/_SUCCESS``), via the Hadoop FS API — so a
    transient read error or corrupt index is never mistaken for "absent".

    Refuses a pre-batch-layout (flat parquet) directory outright: silently
    treating it as "absent" would skip cross-corpus dedup against the whole
    existing index AND corrupt the directory into a mixed layout on the
    next write."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id=*/_SUCCESS")
    statuses = fs.globStatus(glob)
    if statuses is not None and len(statuses) > 0:
        return True
    flat = fs.globStatus(jvm.org.apache.hadoop.fs.Path(f"{path}/*.parquet"))
    if flat is not None and len(flat) > 0:
        raise ValueError(
            f"{path} holds flat parquet files from a pre-batch-id layout; "
            "migrate them into a batch_id=0/ subdirectory (one `mv`) before "
            "resuming the stream, or point at a fresh path."
        )
    return False


def tumbling_aggregate(
    events: DataFrame,
    time_col: str = "ts",
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    agg: str = "sum",
) -> DataFrame:
    """Event stream → (key, window_start, y) panel with late-data handling.

    Works on both batch and streaming DataFrames (watermark is a no-op in
    batch mode, so the same definition serves the DuckDB oracle)."""
    agg_fn = {"sum": F.sum, "count": F.count, "mean": F.avg, "min": F.min, "max": F.max}[agg]
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(*key_cols, F.window(time_col, window).alias("_w"))
        .agg(agg_fn(F.col(value_col)).alias("y"))
        .select(
            *key_cols,
            F.col("_w.start").alias("ds"),
            "y",
        )
    )


def _replay_guard(mf, batch_id: int) -> bool:
    """True iff this batch was already applied to ``mf``'s IN-PROCESS state.

    foreachBatch may redeliver a batch after a failure between the state
    update and the checkpoint commit; batch ids are monotone, so skipping
    ids <= the last applied one makes the state append exactly-once within
    a process. Across a restart the state is rebuilt at fit time and the
    stream replays every uncommitted batch onto it exactly once."""
    last = getattr(mf, "_stream_last_batch", None)
    if last is not None and int(batch_id) <= last:
        return True
    mf._stream_last_batch = int(batch_id)
    return False


def stream_update(
    mf,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Feed a stream of new observations into a fitted ``MLForecast``.

    Each micro-batch goes through ``mf.update`` (append + tail trim). Returns
    the StreamingQuery; callers ``awaitTermination()`` it."""

    def _update(batch: DataFrame, _batch_id: int):
        if batch.isEmpty():
            return
        if _replay_guard(mf, _batch_id):
            return
        mf.update(batch)

    writer = (
        stream_df.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_ewm(
    stream_df: DataFrame,
    alpha: float = 0.3,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    out_col: str = "ewm",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-series EWM whose recursion state (one double) is carried across
    micro-batches in the state store — the streaming analogue of the
    carried-EWM predict mode (O(1) state per series, no history replay).

    Rows inside a batch are processed in ``time_col`` order; the final state
    per series persists through the checkpoint, so a restarted
    ``availableNow`` query continues the recursion exactly where the last
    run stopped."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        list(stream_df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )
    state_schema = T.StructType([T.StructField("e", T.DoubleType())])

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        e = float("nan")
        if state.exists:
            (stored,) = state.get
            if stored is not None:
                e = float(stored)
        # A group's rows arrive as multiple Arrow chunks in arbitrary order
        # once the series exceeds arrow.maxRecordsPerBatch in one micro-batch
        # — materialize them all before sorting, or the recursion would
        # consume values out of time order.
        chunks = list(pdfs)
        if not chunks:
            state.update((None if np.isnan(e) else float(e),))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(time_col)
        vals = pdf[target_col].to_numpy(dtype="float64")
        out = np.empty(len(vals))
        for i, v in enumerate(vals):
            if not np.isnan(v):
                e = v if np.isnan(e) else alpha * v + (1 - alpha) * e
            out[i] = e
        pdf[out_col] = out
        yield pdf
        state.update((None if np.isnan(e) else float(e),))

    return stream_df.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_forecast(
    mf,
    stream_df: DataFrame,
    h: int,
    forecast_path: str,
    checkpoint_dir: str,
    engine: str = "cogroup",
    only_updated: bool = True,
    trigger_available_now: bool = True,
    cogroup_buckets: "int | None" = None,
):
    """Continuous re-forecasting: each micro-batch of new observations is
    appended to the fitted pipeline's state (``mf.update``) and a fresh
    h-step forecast is written to ``forecast_path/batch_id=N/``.

    The per-batch forecast is what makes this viable as a stream stage:
    with ``engine='cogroup'`` (default) the whole h-step recursive rollout
    is ONE Spark job per batch (``local_predict.py``), not h sequential
    frontier jobs — at a 1-minute trigger interval the lockstep loop's
    h×(union+window+checkpoint) jobs would dominate the trigger budget.
    Falls back to ``engine='spark'`` when the feature set pools across
    series (the cogroup engine refuses those plans).

    ``only_updated`` restricts each batch's forecast to the series that
    actually received data (the batch's distinct ids — collected to the
    driver, so it assumes batches touch a bounded set of series; pass
    ``only_updated=False`` to re-forecast the full panel every batch).

    Forecast partitions are written with mode=overwrite into their own
    ``batch_id=N/`` directory, so a replayed batch replaces its earlier
    partial output instead of duplicating it — read ``forecast_path`` as
    one parquet dataset (partition discovery adds ``batch_id``; the latest
    batch_id per series is the current forecast). Returns the
    ``StreamingQuery``."""
    s = mf.schema_

    eng = {"v": engine}

    def _process(batch: DataFrame, batch_id: int):
        if not batch.head(1):
            return
        if not _replay_guard(mf, batch_id):
            mf.update(batch)
        # a replayed batch skips the state append but still rewrites its
        # forecast partition (overwrite makes that idempotent)
        ids = None
        if only_updated:
            ids = [r[0] for r in batch.select(s.id_col).distinct().collect()]
        kwargs = (
            {"cogroup_buckets": cogroup_buckets} if eng["v"] == "cogroup" else {}
        )
        try:
            preds = mf.predict(h, ids=ids, engine=eng["v"], **kwargs)
        except CogroupUnsupportedError:
            if eng["v"] == "spark":
                raise
            eng["v"] = "spark"  # remember: don't re-pay the refusal per batch
            preds = mf.predict(h, ids=ids, engine="spark")
        preds.write.mode("overwrite").parquet(
            f"{forecast_path}/batch_id={int(batch_id)}"
        )

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_score(
    mf,
    stream_df: DataFrame,
    feature_cols: Optional[list[str]] = None,
) -> DataFrame:
    """Attach model-score columns to a (streaming or batch) feature frame
    using the fitted models' pure-expression scorers — stays JVM-side, so it
    runs inside the stream without Python workers."""
    out = stream_df
    for name, model in mf.models_.items():
        out = out.withColumn(name, mf._score_col(model))
    return out


def sliding_aggregate(
    events: DataFrame,
    time_col: str = "ts",
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    agg: str = "sum",
) -> DataFrame:
    """Sliding-window aggregation (overlapping windows every ``slide``);
    batch + streaming, like :func:`tumbling_aggregate`."""
    agg_fn = {"sum": F.sum, "count": F.count, "mean": F.avg, "min": F.min, "max": F.max}[agg]
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(*key_cols, F.window(time_col, window, slide).alias("_w"))
        .agg(agg_fn(F.col(value_col)).alias("y"))
        .select(*key_cols, F.col("_w.start").alias("ds"), F.col("_w.end").alias("ds_end"), "y")
    )


def session_aggregate(
    events: DataFrame,
    time_col: str = "ts",
    key_cols: tuple = ("user_id",),
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key (``F.session_window``); emits per-session count/sum and
    bounds. Batch + streaming."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(*key_cols, F.session_window(time_col, gap).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("y"),
        )
        .select(
            *key_cols,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
            "y",
        )
    )


def stream_dedup(
    docs: DataFrame,
    text_col: str = "text",
    dedup_cols: tuple = (),
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-dedup a document stream by content digest, first-seen wins.

    Streaming: ``withWatermark`` + ``dropDuplicatesWithinWatermark`` — the
    dedup state store holds only digests younger than the watermark, so
    state is bounded by (arrival rate x watermark), not corpus size; a
    duplicate arriving later than the watermark is re-emitted, the standard
    correctness/state trade of streaming dedup. Batch: plain
    ``dropDuplicates`` on the digest (global, unbounded — one shuffle).

    ``dedup_cols`` overrides the digest key (e.g. a precomputed fingerprint
    column); by default the key is ``md5(text_col)``.
    """
    keys = list(dedup_cols)
    out = docs
    if not keys:
        out = docs.withColumn("content_hash", F.md5(F.col(text_col)))
        keys = ["content_hash"]
    if out.isStreaming:
        return out.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)


def stream_near_dedup(
    docs: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    trigger_available_now: bool = True,
):
    """NEAR-duplicate dedup of a document stream against a persistent
    MinHash signature index — the continuous-ingest shape of the batch
    ``dedup_corpus``: each micro-batch (1) drops batch-internal near-dups
    (banded self-join on the batch alone — tiny), (2) probes the persisted
    corpus index with ``minhash_probe_candidates`` (probe-driven band join:
    the corpus is touched only at matching buckets), (3) appends surviving
    docs to ``output_path`` and their signatures to the index. First-seen
    wins, like ``stream_dedup``, but at ``est_jaccard >= threshold``
    instead of exact equality.

    State is the parquet signature table — ~(16 + 8*num_hashes) bytes per
    corpus doc, readable by any engine, shared with the batch
    ``minhash_probe_candidates`` path; the streaming state store holds
    nothing (foreachBatch), so restarts resume from the checkpoint with the
    index intact. Both ``output_path`` and ``index_path`` are laid out as
    ``batch_id=N/`` parquet partition directories written with
    mode=overwrite, so a replayed batch replaces its own prior partial
    output instead of appending duplicates (read either path as one
    parquet dataset; partition discovery adds a ``batch_id`` column).
    Returns the ``StreamingQuery``."""
    from .operators.dedup import (
        minhash_lsh_candidates,
        minhash_probe_candidates,
        minhash_signatures,
        shingle_df,
    )

    spark = docs.sparkSession

    def process(batch: DataFrame, _batch_id: int):
        if not batch.head(1):
            return
        sigs = minhash_signatures(
            shingle_df(batch, text_col=text_col, id_col=id_col, n=n,
                       distinct=False),
            id_col=id_col,
            num_hashes=num_hashes,
        ).cache()
        # (1) batch-internal: keep the min id of every candidate pair
        internal = minhash_lsh_candidates(
            sigs, id_col=id_col, num_bands=num_bands, num_hashes=num_hashes
        ).filter(F.col("est_jaccard") >= threshold)
        drop_internal = internal.select(F.col("id_b").alias(id_col)).distinct()
        survivors = sigs.join(drop_internal, id_col, "left_anti")
        # (2) probe the persisted corpus index (absent on the first batch).
        # Existence is checked via the Hadoop FS API so a corrupt index or a
        # transient read error PROPAGATES instead of silently skipping
        # cross-corpus dedup for the batch. Rows from THIS batch id (a
        # replay's own earlier partial write) are excluded, or every doc
        # would match itself and the replay would emit nothing.
        have_index = _committed_batch_dirs_exist(spark, index_path)
        if have_index:
            index = spark.read.parquet(index_path).filter(
                F.col("batch_id") < F.lit(int(_batch_id))
            )
            hits = minhash_probe_candidates(
                survivors,
                index,
                id_col=id_col,
                num_bands=num_bands,
                num_hashes=num_hashes,
            ).filter(F.col("est_jaccard") >= threshold)
            drop_vs_index = hits.select(
                F.col("probe_id").alias(id_col)
            ).distinct()
            survivors = survivors.join(drop_vs_index, id_col, "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        # (3) emit kept docs; extend the index with their signatures.
        # Writes go to a per-batch subdirectory with mode=overwrite so a
        # replayed batch (failure between the output write and the
        # checkpoint commit) REPLACES its own prior partial output instead
        # of appending duplicates — exactly-once per batch directory.
        batch.join(survivors.select(id_col), id_col, "left_semi").write.mode(
            "overwrite"
        ).parquet(f"{output_path}/batch_id={_batch_id}")
        survivors.write.mode("overwrite").parquet(
            f"{index_path}/batch_id={_batch_id}"
        )
        sigs.unpersist()

    writer = docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_asof_enrich(
    facts: DataFrame,
    reference: DataFrame,
    output_path: str,
    checkpoint_path: str,
    on: str = "ts",
    by: tuple = (),
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance=None,
    suffix: str = "_right",
    block_size="auto",
    trigger_available_now: bool = True,
):
    """Enrich a streaming fact feed with the as-of row of a REFERENCE table
    (trades with the prevailing quote, sensor readings with the latest
    calibration). Structured Streaming's stream-static joins are equi-only,
    so the as-of semantics run inside ``foreachBatch``: each micro-batch is
    :func:`mlforecast_spark.joins.asof_join`-ed against ``reference`` and
    written to ``output_path/batch_id=N`` with mode=overwrite — a replayed
    batch replaces its own earlier partial write (the same idempotence
    contract as :func:`stream_near_dedup`). ``reference`` may be a
    DataFrame (its file listing is SNAPSHOTTED at plan time — fine for a
    fixed table), a parquet path string, or a zero-arg callable returning a
    DataFrame; the latter two are re-resolved per micro-batch, so a
    slowly-changing dimension table that gets appended is picked up on the
    next batch without restarting the query.

    Scale notes: the per-batch cost is the as-of join's one shuffle on
    ``by`` over (batch + reference); a keyless feed gets the blocked
    parallel scan, with the equi-depth bin boundaries derived ONCE from
    the reference table at query start (one sampled ``approxQuantile``
    job) and reused for every micro-batch — bins only affect parallelism,
    never results, so boundaries from a query-start snapshot stay correct
    even for a slowly-changing reference. Pass an explicit ``block_size``
    (or a boundary list from :func:`mlforecast_spark.joins.
    derive_asof_bins`) to skip the derive entirely. Batch input: returns
    the plain ``asof_join`` result instead of starting a query. Streaming
    input returns the ``StreamingQuery``."""
    from .joins import _block_expr, asof_join, derive_asof_bins

    kwargs = dict(
        on=on, by=by, direction=direction,
        allow_exact_matches=allow_exact_matches, tolerance=tolerance,
        suffix=suffix, block_size=block_size,
    )
    spark = facts.sparkSession

    def _ref():
        if callable(reference):
            return reference()
        if isinstance(reference, str):
            return spark.read.parquet(reference)
        return reference

    if not facts.isStreaming:
        return asof_join(facts, _ref(), **kwargs)

    # keyless auto-blocking: derive the equi-depth bins ONCE from the
    # reference (not per batch — asof_join's 'auto' would rerun
    # approxQuantile over batch UNION reference every micro-batch)
    if kwargs["block_size"] == "auto" and not by:
        ref0 = _ref()
        if _block_expr(on, dict(ref0.dtypes)[on]) is not None:
            bins = derive_asof_bins(ref0, on)
            kwargs["block_size"] = bins if len(bins) >= 2 else None
        else:
            kwargs["block_size"] = None

    def process(batch: DataFrame, _batch_id: int):
        if not batch.head(1):
            return
        asof_join(batch, _ref(), **kwargs).write.mode("overwrite").parquet(
            f"{output_path}/batch_id={_batch_id}"
        )

    writer = facts.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_stream_asof(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple = (),
    tolerance: str = "30 seconds",
    watermark: str = "1 minute",
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Tolerance-bounded BACKWARD as-of join of two LIVE streams (trades to
    the prevailing quote when both are unbounded feeds) — the stream-stream
    case :func:`stream_asof_enrich` (static/slowly-changing reference)
    cannot cover.

    Shape: a watermarked stream-stream LEFT OUTER interval join pairs each
    left row with every right row in ``[on - tolerance, on]`` (state on
    both sides is evicted by the watermark — this is why the as-of must be
    tolerance-BOUNDED: an unbounded backward match would need infinite
    right-side state), then a windowed ``max_by`` aggregation keyed by the
    left row picks the latest right row per left row. Two chained stateful
    operators; results emit in APPEND mode once the event-time watermark
    passes the left row's window — i.e. matches arrive with up to
    ``tolerance + watermark`` event-time latency, the price of exactly-once
    semantics on two unbounded inputs. Late right rows beyond
    ``watermark`` are dropped by the join, standard watermark semantics.

    ``allow_exact_matches=False`` makes the bound strictly-before. Ties
    among right rows at the same (by, on) pick an arbitrary one (streams
    have no scan order to break ties with). Right columns arrive suffixed
    on name collisions. Null ``by`` keys match each other (``eqNullSafe``,
    same null grouping as the batch path's ``Window.partitionBy``).

    CARDINALITY CAVEAT: the match-pick aggregation groups by EVERY left
    column, so left rows that are fully duplicate — identical in every
    column including the timestamp — collapse to ONE output row (batch
    ``asof_join``/``merge_asof`` would emit both). Streams have no stable
    row identity to salt with (a ``uuid()`` column would break
    exactly-once on replay: re-executed tasks regenerate different ids
    into state). If exact cardinality of duplicate rows matters, give the
    left stream a unique id column upstream (an offset, a sequence
    number) — any distinguishing column preserves cardinality since all
    left columns key the aggregation. Batch inputs degrade to
    :func:`mlforecast_spark.joins.asof_join` with the same tolerance.
    Returns an unstarted DataFrame — attach your own ``writeStream``.
    """
    from .joins import asof_join

    by = list(by)
    if not (left.isStreaming and right.isStreaming):
        return asof_join(
            left, right, on=on, by=by, direction="backward",
            allow_exact_matches=allow_exact_matches,
            tolerance=F.expr(f"INTERVAL {tolerance}"), suffix=suffix,
        )
    val_cols = [c for c in right.columns if c != on and c not in by]
    if not val_cols:
        raise ValueError("right side has no value columns beyond the join keys")
    out_name = {c: (c + suffix if c in left.columns else c) for c in val_cols}

    l = left.withWatermark(on, watermark)
    r = right.withWatermark(on, watermark).select(
        *[F.col(c).alias(f"__ssa_{c}") for c in by],
        F.col(on).alias("__ssa_on"),
        *[F.col(c).alias(out_name[c]) for c in val_cols],
    )
    cond = F.col("__ssa_on") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
    cond = cond & (
        (F.col("__ssa_on") <= F.col(on))
        if allow_exact_matches
        else (F.col("__ssa_on") < F.col(on))
    )
    for c in by:
        # eqNullSafe: null by-keys match each other, like the batch path's
        # Window.partitionBy (plain == would silently never match them)
        cond = cond & F.col(c).eqNullSafe(F.col(f"__ssa_{c}"))
    joined = l.join(r, cond, "leftOuter")

    # the aggregation needs EXACTLY ONE event-time column: window(on) keys
    # the state (evicted at watermark), so the per-row timestamp key is
    # re-materialized without its event-time tag
    plain_on = F.timestamp_micros(F.unix_micros(F.col(on))).alias("__ssa_lts")
    other_left = [c for c in left.columns if c != on]
    agg = (
        joined.groupBy(
            F.window(F.col(on), tolerance), plain_on, *[F.col(c) for c in other_left]
        )
        .agg(
            F.max_by(
                F.struct(*[F.col(out_name[c]) for c in val_cols]), F.col("__ssa_on")
            ).alias("__ssa_m")
        )
    )
    return agg.select(
        *[
            F.col("__ssa_lts").alias(on) if c == on else F.col(c)
            for c in left.columns
        ],
        *[F.col("__ssa_m")[out_name[c]].alias(out_name[c]) for c in val_cols],
    )


def _dir_exists(spark, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def stream_semantic_dedup(
    vectors: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    nprobe: int = 1,
    seed: int = 7,
    max_iter: int = 10,
    trigger_available_now: bool = True,
):
    """SEMANTIC near-dedup of an embedding stream against a persistent
    index — the continuous-ingest shape of the batch ``semantic_dedup``
    (the embedding analog of :func:`stream_near_dedup`). Per micro-batch:

    1. batch-internal ``semantic_dedup`` (its quadratic term is confined to
       the batch's own inverted lists — tiny);
    2. probe the persisted corpus index: the FIRST batch trains the coarse
       quantizer (seeded, deterministic for a replay) and persists its
       centroids; every later batch assigns to the SAME centroids, so the
       cross-batch check is one :func:`ivf_search` top-1 at ``nprobe``
       lists — a doc is dropped when its best indexed neighbor has
       ``cosine >= 1 - eps``. Sharing centroids is what keeps the probe
       list-local at any corpus size (the SemDeDup boundary caveat
       applies: near-dups straddling a list boundary need ``nprobe > 1``);
    3. append survivors' embeddings (+ list ids) to the index and the
       surviving rows to the output, each into a ``batch_id=N/`` directory
       with mode=overwrite — a replayed batch REPLACES its own earlier
       partial write (same idempotence contract as ``stream_near_dedup``).

    State is two parquet tables (centroids once, one index row per kept
    vector); the streaming state store holds nothing (foreachBatch).
    Returns the ``StreamingQuery``."""
    from .operators.similarity import (
        IVFIndex,
        build_ivf_index,
        ivf_search,
        semantic_dedup,
    )

    spark = vectors.sparkSession
    centroids_path = f"{index_path}/centroids"
    lists_path = f"{index_path}/lists"

    def process(batch: DataFrame, _batch_id: int):
        if not batch.head(1):
            return
        # (1) batch-internal semantic dedup
        flags = semantic_dedup(
            batch, eps=eps, id_col=id_col, vec_col=vec_col,
            n_lists=n_lists, seed=seed, max_iter=max_iter,
        )
        kept = batch.join(
            flags.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )
        # (2) coarse quantizer: first committed batch trains it; replays and
        # later batches reuse it so list geometry never drifts
        if _dir_exists(spark, f"{centroids_path}/_SUCCESS"):
            centroids = spark.read.parquet(centroids_path)
        else:
            trained = build_ivf_index(
                batch, id_col=id_col, vec_col=vec_col, n_lists=n_lists,
                seed=seed, max_iter=max_iter,
            )
            trained.centroids.write.mode("overwrite").parquet(centroids_path)
            centroids = spark.read.parquet(centroids_path)
        # assign THIS batch's survivors to the shared lists
        batch_index = _assign_to_centroids(
            kept, centroids, id_col=id_col, vec_col=vec_col
        )
        if _committed_batch_dirs_exist(spark, lists_path):
            index_rows = spark.read.parquet(lists_path).filter(
                F.col("batch_id") < F.lit(int(_batch_id))
            )
            idx = IVFIndex(
                centroids,
                index_rows.select("vec_id", "embedding", "list_id"),
            )
            hits = ivf_search(
                idx, kept, k=1, id_col=id_col, vec_col=vec_col, nprobe=nprobe
            ).filter(F.col("cosine") >= 1.0 - eps)
            drop = hits.select(F.col("query_id").alias(id_col)).distinct()
            kept = kept.join(drop, id_col, "left_anti")
            batch_index = batch_index.join(drop, id_col, "left_anti")
        kept = kept.localCheckpoint(eager=True)
        # (3) idempotent per-batch writes
        kept.write.mode("overwrite").parquet(f"{output_path}/batch_id={_batch_id}")
        batch_index.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            "list_id",
        ).write.mode("overwrite").parquet(f"{lists_path}/batch_id={_batch_id}")

    writer = vectors.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _assign_to_centroids(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid list assignment (ivf_search's probe at nprobe=1)."""
    from .operators.similarity import _centroid_probe

    return _centroid_probe(df, centroids, id_col, vec_col, 1).select(
        df["*"], F.col("_list").alias("list_id")
    )


def stream_paragraph_dedup(
    docs: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    trigger_available_now: bool = True,
):
    """Incremental corpus-wide paragraph dedup of a document stream — the
    continuous-ingest shape of :func:`~mlforecast_spark.operators.dedup.
    dedup_paragraphs`: each micro-batch (1) keeps only the first occurrence
    of every paragraph WITHIN the batch, (2) strips paragraphs already in
    the persistent hash index (paragraphs seen in any earlier batch),
    (3) writes the reassembled documents and appends the new paragraph
    hashes to the index.

    State is a parquet table of 96-bit paragraph hashes (16 bytes per
    distinct corpus paragraph) — shared, engine-readable, and the only
    thing a restart needs. Writes use the same exactly-once layout as
    :func:`stream_near_dedup`: per-batch ``batch_id=N/`` directories with
    mode=overwrite, replays excluded from the index probe by
    ``batch_id < current``. Blank separators and paragraphs below
    ``min_chars`` always survive (null hashes never join). Returns the
    ``StreamingQuery``."""
    from .operators.dedup import _paragraph_lines, _reassemble_paragraphs

    spark = docs.sparkSession

    def process(batch: DataFrame, _batch_id: int):
        if not batch.head(1):
            return
        hashed = _paragraph_lines(batch, text_col, id_col, sep, min_chars)
        narrow = hashed.select("_did", "_pos", "_h1", "_h2").filter(
            F.col("_h1").isNotNull()
        )
        g1 = (
            narrow.groupBy("_h1", "_h2")
            .agg(F.min("_did").alias("_wdid"), F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .drop("_c")
        )
        winners = (
            narrow.join(g1, on=["_h1", "_h2"])
            .filter(F.col("_did") == F.col("_wdid"))
            .groupBy("_h1", "_h2", "_wdid")
            .agg(F.min("_pos").alias("_wpos"))
        )
        kept = hashed.join(winners, on=["_h1", "_h2"], how="left").filter(
            F.col("_wdid").isNull()
            | (
                (F.col("_wdid") == F.col("_did"))
                & (F.col("_wpos") == F.col("_pos"))
            )
        ).select("_did", "_pos", "_para", "_h1", "_h2")
        if _committed_batch_dirs_exist(spark, index_path):
            seen = spark.read.parquet(index_path).filter(
                F.col("batch_id") < F.lit(int(_batch_id))
            )
            # null hashes (blanks / short paragraphs) never equi-match, so
            # they survive the anti join by construction
            kept = kept.join(seen, on=["_h1", "_h2"], how="left_anti")
        kept = kept.localCheckpoint(eager=True)
        out = _reassemble_paragraphs(batch, kept, text_col, id_col, sep)
        out.write.mode("overwrite").parquet(f"{output_path}/batch_id={_batch_id}")
        kept.filter(F.col("_h1").isNotNull()).select(
            "_h1", "_h2"
        ).distinct().write.mode("overwrite").parquet(
            f"{index_path}/batch_id={_batch_id}"
        )

    writer = docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
