"""Sequence packing — assign documents to fixed-token-budget training
sequences, the step between a cleaned corpus and a pretraining dataloader.

Two industry-standard packing disciplines, both deterministic (the order
inside a shard is the md5 hash of the doc key, so output is a pure function
of the data — identical on any cluster shape, like
:mod:`~mlforecast_spark.operators.sampling`):

- ``mode='concat'`` (GPT-style concat-then-chunk): documents are laid end
  to end in hash order and the token stream is cut every ``max_tokens``.
  Every sequence is exactly full; a document may straddle a cut, in which
  case it appears in 2+ sequences with a ``doc_start``/``slice_tokens``
  span. ENTIRELY expression-based: one window cumulative sum per shard,
  then ``sequence()``+``explode`` for the straddle rows — no Python in the
  plan, scales as one bounded shuffle on the shard key.
- ``mode='greedy'`` (no-split next-fit): documents are never split; a new
  sequence starts when the next doc would overflow the budget. The
  next-fit recurrence ("running fill, reset on overflow") is inherently
  sequential, so it runs as an Arrow ``applyInPandas`` pass per shard —
  the sanctioned slow path, bounded by shard size. Documents longer than
  ``max_tokens`` get a sequence of their own, flagged ``overflow=true``
  (truncation policy belongs to the tokenizer stage, not here).

Sharding: ``pmod(xxhash64(key), num_shards)`` splits the corpus into
independent packing domains. Packing quality is unaffected (each shard's
stream is cut the same way); parallelism and shuffle partition sizes are
set by ``num_shards`` — scale it with the corpus (shards of ~1-10M docs
are comfortable for the greedy Arrow pass).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# in-shard sequence index is packed into the global seq_id below this shift:
# supports 2^40 sequences per shard and ~2^23 shards in a signed long
_SEQ_SHIFT = 2**40


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
    mode: str = "concat",
    num_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Assign each document to packed training sequences of at most
    ``max_tokens`` tokens. Returns one row per (document, sequence) slice:

    - ``concat``: ``(id_col, shard, seq, seq_id, offset_in_seq, doc_start,
      slice_tokens)`` — straddling docs emit one row per sequence touched.
    - ``greedy``: ``(id_col, shard, seq, seq_id, offset_in_seq, doc_start,
      slice_tokens, overflow)`` — exactly one row per doc
      (``doc_start = 0``, ``slice_tokens`` = the doc's full token count).

    ``seq_id`` is globally unique (``shard * 2^40 + seq``); ``seq`` is the
    0-based sequence index within the shard. Documents with zero/null
    token counts are dropped (they contribute no tokens). Sequences are
    exactly full in concat mode; in greedy mode ``offset_in_seq`` is the
    doc's position inside its (possibly underfull) sequence."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if mode not in ("concat", "greedy"):
        raise ValueError("mode must be 'concat' or 'greedy'")
    nt = F.col(token_count_col).cast("long")
    shard = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit("pack" + salt)),
        F.lit(num_shards),
    ).cast("int")
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    base = df.filter(nt > 0).select(
        F.col(id_col),
        nt.alias("_nt"),
        shard.alias("shard"),
        order.alias("_ord"),
    )
    if mode == "concat":
        w = Window.partitionBy("shard").orderBy("_ord")
        staged = base.select(
            id_col,
            "shard",
            "_nt",
            (F.sum("_nt").over(w) - F.col("_nt")).alias("_start"),
        )
        # token span [_start, _start + _nt) cut every max_tokens:
        # sequences floor(_start/m) .. floor((_start + _nt - 1)/m)
        m = F.lit(int(max_tokens)).cast("long")
        first = F.floor(F.col("_start") / m)
        last = F.floor((F.col("_start") + F.col("_nt") - 1) / m)
        exploded = staged.select(
            id_col,
            "shard",
            "_nt",
            "_start",
            F.explode(F.sequence(first, last)).alias("seq"),
        )
        seq_lo = F.col("seq") * m
        seq_hi = seq_lo + m
        slice_lo = F.greatest(F.col("_start"), seq_lo)
        slice_hi = F.least(F.col("_start") + F.col("_nt"), seq_hi)
        return exploded.select(
            id_col,
            "shard",
            F.col("seq").cast("long").alias("seq"),
            (F.col("shard").cast("long") * F.lit(_SEQ_SHIFT) + F.col("seq")).alias(
                "seq_id"
            ),
            (slice_lo - seq_lo).cast("int").alias("offset_in_seq"),
            (slice_lo - F.col("_start")).cast("int").alias("doc_start"),
            (slice_hi - slice_lo).cast("int").alias("slice_tokens"),
        )

    # greedy next-fit: per-shard sequential fill, Arrow batch per shard
    out_schema = (
        f"{id_col} {dict(base.dtypes)[id_col]}, shard int, seq long, "
        "seq_id long, offset_in_seq int, doc_start int, slice_tokens int, "
        "overflow boolean"
    )
    budget = int(max_tokens)

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord", kind="mergesort").reset_index(drop=True)
        seqs, offs, ovfl = [], [], []
        cur_seq, fill = 0, 0
        for n in pdf["_nt"]:
            n = int(n)
            if n > budget:
                # oversized doc: its own flagged sequence
                if fill > 0:
                    cur_seq += 1
                seqs.append(cur_seq)
                offs.append(0)
                ovfl.append(True)
                cur_seq += 1
                fill = 0
                continue
            if fill + n > budget:
                cur_seq += 1
                fill = 0
            seqs.append(cur_seq)
            offs.append(fill)
            ovfl.append(False)
            fill += n
        sh = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                pdf.columns[0]: pdf[pdf.columns[0]],
                "shard": sh,
                "seq": pd.Series(seqs, dtype="int64"),
                "seq_id": [sh * _SEQ_SHIFT + s for s in seqs],
                "offset_in_seq": pd.Series(offs, dtype="int32"),
                "doc_start": pd.Series([0] * len(pdf), dtype="int32"),
                "slice_tokens": pdf["_nt"].astype("int32"),
                "overflow": pd.Series(ovfl, dtype="bool"),
            }
        )

    # column order matters for pack_shard's pdf.columns[0] == id_col
    src = base.select(id_col, "shard", "_nt", "_ord")
    return src.groupBy("shard").applyInPandas(pack_shard, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row efficiency summary of a :func:`pack_sequences` output:
    sequence count, mean fill fraction, token totals — the numbers that
    decide whether the packing discipline wastes training FLOPs."""
    per_seq = packed.groupBy("seq_id").agg(
        F.sum("slice_tokens").alias("_fill"),
        F.count(F.lit(1)).alias("_docs"),
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("_fill").alias("total_tokens"),
        F.round(F.avg(F.col("_fill") / F.lit(float(max_tokens))), 6).alias(
            "mean_fill"
        ),
        F.round(F.avg("_docs"), 6).alias("mean_docs_per_seq"),
        F.max("_fill").alias("max_seq_tokens"),
    )


def write_training_shards(
    packed: DataFrame,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize a :func:`pack_sequences` assignment as a training-ready
    parquet dataset: one row per (sequence, slice) with the document
    payload attached, written partitioned by ``shard`` so a dataloader
    (or a downstream tokenizer job) reads one shard directory per worker
    with no cross-worker overlap, rows pre-sorted by (seq, offset) within
    each file.

    The payload join is the ONLY place document bytes move, and it is an
    equi-join on the doc key after all assignment logic ran payload-free —
    the same payload-last discipline as the dedup operators. Layout:
    ``path/shard=N/*.parquet`` with columns
    ``(seq, seq_id, offset_in_seq, doc_start, slice_tokens, id, text)``."""
    out = (
        packed.join(docs.select(F.col(id_col), F.col(text_col)), id_col)
        .repartition("shard")
        .sortWithinPartitions("shard", "seq", "offset_in_seq")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
