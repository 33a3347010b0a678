"""Scale-behavior bench for the LLM-data-pipeline operator families that sit
outside the headline gate bench (quality gate, corpus dedup, packing,
mixture, LM scoring, span dedup, semantic dedup). Prints one JSON line per
SF dir given (default sf0.1 and the sf1 replication if present) — the
committed evidence that the new families' cost scales with data, not with
fixed overhead.

Usage: python tools/bench_pipeline.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _force(df) -> int:
    cols = [F.col(f"`{c}`") for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def queries(spark, sf_dir):
    from mlforecast_spark.operators.dedup import (
        dedup_corpus,
        dedup_paragraphs,
        repeated_spans,
    )
    from mlforecast_spark.operators.lm import score_docs, train_ngram_lm
    from mlforecast_spark.operators.packing import pack_sequences
    from mlforecast_spark.operators.sampling import mixture_sample
    from mlforecast_spark.operators.similarity import semantic_dedup
    from mlforecast_spark.operators.text import quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def lm_q():
        lm = train_ngram_lm(docs.filter("doc_id % 2 = 0"), order=2)
        return score_docs(docs.filter("doc_id % 2 = 1"), lm)

    return {
        "quality_filter": lambda: quality_filter(docs),
        "dedup_corpus_minhash": lambda: dedup_corpus(docs, method="minhash"),
        # token-boundary separator: the synthetic corpus is single-line, so
        # sep=' ' exercises the same plan with maximal duplicate mass
        "dedup_paragraphs": lambda: dedup_paragraphs(docs, sep=" "),
        "repeated_spans_w8": lambda: repeated_spans(docs, window=8),
        "pack_concat": lambda: pack_sequences(
            docs.select("doc_id", F.col("n_chars").cast("long").alias("n_tokens")),
            max_tokens=1000,
            num_shards=16,
        ),
        "mixture_sample": lambda: mixture_sample(
            docs.select("doc_id", "lang"),
            "lang",
            {"en": 0.5, "de": 0.25, "fr": 0.125, "zh": 0.125},
        ),
        "lm_train_score": lm_q,
        # n_lists derived from the corpus (ceil(count/1000)): a fixed list
        # count is a scale cliff — 10x vectors at the same n_lists costs
        # 100x the within-list pairwise work (measured 4.6 s -> 309 s,
        # sf0.1 -> sf1, before this was parameterized)
        "semantic_dedup": lambda: semantic_dedup(
            embs, eps=0.15, seed=7, max_iter=3, train_fraction=0.5,
            target_list_size=1000,
        ),
    }


CONTROL_SF = "/root/testdata/sf0.1"


def _controls(spark, reps=2):
    """Per-run machine-drift controls, both on the FIXED sf0.1 documents
    table (drift detection must not scale with the bench SF):

    - ``duckdb_quality_sql_sec``: DuckDB runs the quality-gate oracle SQL
      (__spark_entry__._text_profile_quality_sql) — an independent engine's
      clock on this box.
    - ``spark_sentinel_sec``: a fixed scan+shuffle+aggregate Spark query —
      the JVM/scheduler clock.

    Round-over-round: if every pipeline family moves together WITH the
    controls, it's the machine; if the families move and the controls
    don't, it's the engine. (Added for the round-7 +23%/+47% sf0.1/sf1
    drift that was uniform across untouched queries and could not be
    adjudicated without a same-file baseline.)"""
    import duckdb

    import __spark_entry__ as entry

    out = {}
    if not os.path.isdir(CONTROL_SF):
        return out
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{CONTROL_SF}/documents.parquet')"
    )
    sql = entry._text_profile_quality_sql()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        sec = time.perf_counter() - t0
        best = sec if best is None else min(best, sec)
    out["duckdb_quality_sql_sec"] = round(best, 3)
    docs = spark.read.parquet(f"{CONTROL_SF}/documents.parquet")
    sentinel = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("n_chars").alias("avg_chars"),
        F.sum(F.xxhash64("text").cast("double")).alias("h"),
    )
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        sentinel.collect()
        sec = time.perf_counter() - t0
        best = sec if best is None else min(best, sec)
    out["spark_sentinel_sec"] = round(best, 3)
    return out


def main():
    from mlforecast_spark.utils import get_spark

    sf_dirs = sys.argv[1:] or [
        d
        for d in ("/root/testdata/sf0.1", "/tmp/sfscale/sf1", "/tmp/sfscale/sf10")
        if os.path.isdir(d)
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pipeline-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    control = _controls(spark)
    print(json.dumps({"control": control}))
    results = {"control": control}
    for sf_dir in sf_dirs:
        qs = queries(spark, sf_dir)
        # warm pass at the smallest SF available
        warm = "/root/testdata/sf0.001"
        if os.path.isdir(warm):
            for fn in queries(spark, warm).values():
                try:
                    _force(fn())
                except Exception:
                    pass
        # per-query min across passes, same estimator as tools/bench_both.py:
        # this sandbox swings individual queries 2-4x between back-to-back
        # identical runs, and a single-pass artifact reads machine noise as
        # an operator regression
        reps = int(os.environ.get("PIPELINE_BENCH_REPS", "2"))
        timings = {}
        for _ in range(reps):
            for name, fn in qs.items():
                t0 = time.perf_counter()
                rows = _force(fn())
                sec = round(time.perf_counter() - t0, 3)
                if name not in timings or sec < timings[name]["sec"]:
                    timings[name] = {"sec": sec, "rows": rows}
        total = round(sum(v["sec"] for v in timings.values()), 3)
        results[sf_dir] = {"total_sec": total, "queries": timings}
        print(json.dumps({"sf_dir": sf_dir, "total_sec": total,
                          "queries": timings}))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "PIPELINE_BENCH.json"),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
