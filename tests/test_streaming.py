"""Structured-Streaming adapters: micro-batch update, tumbling aggregation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression


def test_tumbling_aggregate_batch(spark):
    from mlforecast_spark.streaming import tumbling_aggregate

    from mlforecast_spark.utils import load_events

    events = load_events(spark, "/root/testdata/sf0.001")
    out = tumbling_aggregate(events, window="1 day", agg="sum").toPandas()
    exp = (
        events.groupBy("event_type", F.date_trunc("day", "ts").alias("ds"))
        .agg(F.sum("value").alias("y"))
        .toPandas()
    )
    assert len(out) == len(exp)
    m = out.merge(exp, on=["event_type", "ds"], suffixes=("_a", "_b"))
    np.testing.assert_allclose(
        m.sort_values(["event_type", "ds"])["y_a"],
        m.sort_values(["event_type", "ds"])["y_b"],
        rtol=1e-9,
    )


def test_stream_update_micro_batches(spark, tmp_path):
    """File-source stream (availableNow) drives MLForecast.update via
    foreachBatch; the state must advance to the streamed last timestamp."""
    from mlforecast_spark.streaming import stream_update

    hist = spark.createDataFrame(
        [("a", t, float(t)) for t in range(20)], "unique_id string, ds long, y double"
    )
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(hist)

    new_dir = str(tmp_path / "incoming")
    spark.createDataFrame(
        [("a", 20, 20.0), ("a", 21, 21.0)], "unique_id string, ds long, y double"
    ).write.parquet(new_dir)

    stream = spark.readStream.schema("unique_id string, ds long, y double").parquet(new_dir)
    q = stream_update(mf, stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    preds = mf.predict(1).toPandas()
    assert preds["ds"].iloc[0] == 22


def test_stream_forecast_emits_per_batch(spark, tmp_path):
    """Each micro-batch appends to the state and writes an h-step forecast
    for the updated series into its own batch_id partition; the forecast
    after the stream drains must equal a fresh batch predict."""
    from mlforecast_spark.streaming import stream_forecast

    hist = spark.createDataFrame(
        [(sid, t, float(t) + (0.0 if sid == "a" else 100.0))
         for sid in ("a", "b") for t in range(20)],
        "unique_id string, ds long, y double",
    )
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf.fit(hist)

    new_dir = str(tmp_path / "incoming")
    spark.createDataFrame(
        [("a", 20, 20.0), ("a", 21, 21.0)], "unique_id string, ds long, y double"
    ).write.parquet(new_dir)

    stream = spark.readStream.schema(
        "unique_id string, ds long, y double"
    ).parquet(new_dir)
    fc_path = str(tmp_path / "forecasts")
    q = stream_forecast(
        mf, stream, h=3, forecast_path=fc_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    out = spark.read.parquet(fc_path).toPandas()
    assert set(out["unique_id"]) == {"a"}  # only the updated series
    assert sorted(out["ds"]) == [22, 23, 24]  # h steps past the new tail
    ref = mf.predict(3, ids=["a"], engine="cogroup").toPandas()
    merged = out.sort_values("ds").reset_index(drop=True)
    np.testing.assert_allclose(
        merged["LinearRegression"],
        ref.sort_values("ds")["LinearRegression"].to_numpy(),
        rtol=1e-9,
    )


def test_stream_score_is_expression_only(spark, panel):
    from mlforecast_spark.streaming import stream_score

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel)
    feats = mf.preprocess(panel)
    scored = stream_score(mf, feats).toPandas()
    assert "LinearRegression" in scored.columns
    assert scored["LinearRegression"].notna().all()


def test_stateful_ewm_carries_state_across_restarts(spark, tmp_path):
    """applyInPandasWithState: the per-series EWM recursion must continue
    across micro-batches AND across query restarts (state store persists via
    the checkpoint), matching a batch EWM over the concatenated data."""
    import glob
    import os

    import numpy as np
    import pandas as pd

    from mlforecast_spark.streaming import stateful_ewm

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    alpha = 0.3

    def run_batch(rows):
        spark.createDataFrame(
            rows, "unique_id string, ds long, y double"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "unique_id string, ds long, y double"
        ).parquet(src)
        out = stateful_ewm(stream, alpha=alpha)
        q = (
            out.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [("a", t, float(t + 1)) for t in range(5)]
    batch2 = [("a", t, float(t + 1)) for t in range(5, 9)]
    run_batch(batch1)
    run_batch(batch2)  # fresh query, same checkpoint: state must carry

    got = (
        pd.concat([pd.read_parquet(f) for f in glob.glob(f"{outdir}/*.parquet")])
        .sort_values("ds")
        .reset_index(drop=True)
    )
    assert len(got) == 9
    e, exp = float("nan"), []
    for _, _, v in batch1 + batch2:
        e = v if np.isnan(e) else alpha * v + (1 - alpha) * e
        exp.append(e)
    np.testing.assert_allclose(got["ewm"].to_numpy(), exp, rtol=1e-12)


def test_sliding_aggregate_overlap(spark):
    from mlforecast_spark.streaming import sliding_aggregate

    rows = [("a", f"2024-01-01 00:{m:02d}:00", 1.0) for m in range(0, 60, 10)]
    ev = spark.createDataFrame(rows, "event_type string, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    out = sliding_aggregate(
        ev, window="30 minutes", slide="15 minutes", agg="count"
    ).toPandas()
    # 30m windows sliding by 15m over one hour of events: overlapping windows
    assert len(out) > 4  # more windows than tumbling would give
    assert out["y"].max() == 3  # a full 30m window holds 3 events (10m apart)


def test_session_aggregate_gap_split(spark):
    from mlforecast_spark.streaming import session_aggregate

    rows = [
        ("u1", "2024-01-01 00:00:00", 1.0),
        ("u1", "2024-01-01 00:10:00", 2.0),
        ("u1", "2024-01-01 02:00:00", 3.0),  # > 30m gap: new session
        ("u2", "2024-01-01 00:05:00", 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    out = session_aggregate(ev, gap="30 minutes").toPandas()
    u1 = out[out.user_id == "u1"].sort_values("session_start")
    assert len(u1) == 2
    assert u1["n_events"].tolist() == [2, 1]
    assert u1["y"].tolist() == [3.0, 3.0]
    assert len(out[out.user_id == "u2"]) == 1


def test_stream_asof_enrich(spark, tmp_path):
    """Stream-static as-of enrichment: each micro-batch of facts picks up
    the prevailing reference row; a reference append is visible to the NEXT
    batch without restarting; batch input degrades to plain asof_join."""
    import glob
    import os

    import pandas as pd
    from mlforecast_spark.streaming import stream_asof_enrich

    src = str(tmp_path / "src")
    ref = str(tmp_path / "ref")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    spark.createDataFrame(
        [("a", 10, 1.0), ("a", 30, 2.0)], "sym string, ts long, px double"
    ).coalesce(1).write.mode("overwrite").parquet(ref)

    def run_batch(rows):
        spark.createDataFrame(rows, "sym string, ts long, size double").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("sym string, ts long, size double").parquet(src)
        q = stream_asof_enrich(stream, ref, out, ckpt, on="ts", by=("sym",))
        q.awaitTermination(180)

    run_batch([("a", 15, 100.0), ("a", 35, 200.0)])
    got1 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out}/batch_id=*/*.parquet")]
    ).sort_values("ts")
    assert got1["px"].tolist() == [1.0, 2.0]  # 15 -> print@10, 35 -> print@30

    # reference gains a newer print; the NEXT batch sees it (path references
    # are re-read per batch — a DataFrame reference would have snapshotted
    # its file listing at plan time)
    spark.createDataFrame(
        [("a", 40, 3.0)], "sym string, ts long, px double"
    ).coalesce(1).write.mode("append").parquet(ref)
    run_batch([("a", 45, 300.0)])
    got2 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out}/batch_id=*/*.parquet")]
    ).sort_values("ts")
    assert got2[got2.ts == 45]["px"].tolist() == [3.0]

    # batch input: returns the join directly, no query machinery
    facts = spark.createDataFrame([("a", 12, 1.0)], "sym string, ts long, size double")
    direct = stream_asof_enrich(facts, spark.read.parquet(ref), out, ckpt, on="ts", by=("sym",))
    assert direct.collect()[0]["px"] == 1.0


def test_stream_stream_asof(spark, tmp_path):
    """Tolerance-bounded backward as-of of two LIVE streams: each trade
    picks the latest quote within the window; future quotes and quotes
    older than the tolerance never match; unmatched trades emit with null;
    results appear once the watermark passes (second run)."""
    import glob
    import os

    import pandas as pd
    from mlforecast_spark.streaming import stream_stream_asof

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(lsrc, exist_ok=True)

    def write(path, rows, schema):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(path)

    def run():
        ls = spark.readStream.schema("sym string, ts timestamp, size double").parquet(lsrc)
        rs = spark.readStream.schema("sym string, ts timestamp, px double").parquet(rsrc)
        res = stream_stream_asof(ls, rs, on="ts", by=("sym",),
                                 tolerance="30 seconds", watermark="1 minute")
        q = res.writeStream.format("parquet").option("path", out).option(
            "checkpointLocation", ckpt).trigger(availableNow=True).start()
        q.awaitTermination(180)

    write(lsrc, [("a", "2024-01-01 10:00:05", 1.0),
                 ("a", "2024-01-01 10:00:30", 2.0),
                 ("a", "2024-01-01 10:02:00", 9.0)],  # no quote in window
          "sym string, ts string, size double")
    write(rsrc, [("a", "2024-01-01 10:00:01", 101.0),
                 ("a", "2024-01-01 10:00:04", 102.0),
                 ("a", "2024-01-01 10:00:29", 103.0),
                 ("a", "2024-01-01 10:05:00", 999.0)],  # future vs all trades
          "sym string, ts string, px double")
    run()
    # advance both watermarks so batch-1 windows close
    write(lsrc, [("a", "2024-01-01 10:20:00", 3.0)], "sym string, ts string, size double")
    write(rsrc, [("a", "2024-01-01 10:20:00", 500.0)], "sym string, ts string, px double")
    run()
    got = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out}/*.parquet")]
    ).sort_values("ts").reset_index(drop=True)
    by_size = got.set_index("size")["px"]
    assert by_size[1.0] == 102.0   # latest quote <= 10:00:05 within 30s
    assert by_size[2.0] == 103.0   # not the 10:05 future quote
    assert pd.isna(by_size[9.0])   # nothing within [10:01:30, 10:02:00]

    # batch inputs degrade to the plain bounded asof_join
    lb = spark.createDataFrame([("a", "2024-01-01 10:00:05", 1.0)],
                               "sym string, ts string, size double").withColumn("ts", F.to_timestamp("ts"))
    rb = spark.createDataFrame([("a", "2024-01-01 10:00:04", 102.0)],
                               "sym string, ts string, px double").withColumn("ts", F.to_timestamp("ts"))
    direct = stream_stream_asof(lb, rb, on="ts", by=("sym",), tolerance="30 seconds")
    assert direct.collect()[0]["px"] == 102.0
