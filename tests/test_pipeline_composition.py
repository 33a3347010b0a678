"""End-to-end LLM training-data pipeline composition over the driver's
documents table: the operators are built to chain — this pins the whole
recipe (filter -> dedup -> clean -> mix -> score -> pack -> split) with
row-accounting invariants at every stage."""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_full_corpus_pipeline(spark):
    from pyspark.sql import functions as F

    from mlforecast_spark.operators.dedup import dedup_corpus
    from mlforecast_spark.operators.packing import pack_sequences, packing_stats
    from mlforecast_spark.operators.sampling import hash_split, mixture_sample
    from mlforecast_spark.operators.text import bpe_token_count, quality_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (Gopher-style rules, keep flag + audit reasons)
    gated = quality_filter(docs)
    kept = gated.filter("keep").select("doc_id")
    docs1 = docs.join(kept, "doc_id", "left_semi")
    n1 = docs1.count()
    assert 0 < n1 <= n0

    # 2. near-dup removal (minhash bands -> clusters -> one survivor each)
    docs2 = dedup_corpus(docs1, method="minhash")
    n2 = docs2.count()
    assert 0 < n2 <= n1

    # 3. domain mixture (languages present at this SF; exact-float weights)
    langs = {r[0] for r in docs2.select("lang").distinct().collect()}
    w = {"en": 0.5, "de": 0.25, "fr": 0.25}
    w = {k: v for k, v in w.items() if k in langs}
    assert w, "expected at least one target lang in the corpus"
    docs3 = mixture_sample(docs2, "lang", w)
    n3 = docs3.count()
    assert 0 < n3 <= n2

    # 4. token counts -> packing -> budget invariants
    counted = docs3.select(
        "doc_id", bpe_token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(counted, max_tokens=1024, num_shards=4)
    stats = packing_stats(packed, 1024).toPandas()
    assert stats["total_tokens"].iloc[0] == (
        counted.filter("n_tokens > 0").agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert 0 < stats["mean_fill"].iloc[0] <= 1.0

    # 5. deterministic split of the packed sequences by doc key
    split = hash_split(docs3, {"train": 0.9, "val": 0.1})
    by = {r["split"]: r["n"] for r in
          split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by.values()) == n3
    assert by.get("train", 0) > by.get("val", 0)
