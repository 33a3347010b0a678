"""Distributed n-gram language model for corpus quality scoring.

The CCNet-style pipeline signal "how natural is this document's text"
without any external model: train an n-gram LM on a reference corpus (one
``groupBy`` per order — the count tables ARE the model, persistable as
parquet), then score every document by average token log-probability under
**Stupid Backoff** (Brants et al. 2007, "Large Language Models in Machine
Translation") — the smoothing scheme designed exactly for this distributed
table-join setting: no discounting pass over the counts, scoring is

    S(w | context_k) = count(kgram) / count(context)  if count(kgram) > 0
                     = alpha * S(w | context_{k-1})   otherwise

with the unigram base case count(w) / N. Scores are not normalized
probabilities (Stupid Backoff trades that for trainability at scale),
which is irrelevant for ranking/filtering documents.

Scale shape: training is one explode + hash-groupBy per order (map-side
partial aggregation collapses repeats before the shuffle; grams travel as
8-byte xxhash64 keys, never strings). Scoring computes every position's
gram AND context hashes in ONE projection over the per-doc token array,
then runs ``2*order - 1`` left hash-joins against the count tables —
the join-based scoring layout of the Brants paper. With a pruned model
(``min_count``) the tables broadcast; set ``broadcast_counts=False`` to
shuffle on the gram hash when the model is huge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import spread_scan

# separator for hashing token windows; ASCII unit separator never appears in
# whitespace-split tokens
_SEP = "\x1f"


def _tok_array(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # spread a row-group-starved corpus scan before the n-gram hash
    # projections (utils.spread_scan; all LM aggregates are integer counts
    # or per-doc sums over per-partition-complete rows, so partition order
    # cannot move any result)
    df = spread_scan(df.select(F.col(id_col), F.col(text_col)))
    return df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
        ).alias("_toks"),
    )


def _all_order_window_hashes(
    df: DataFrame, order: int, text_col: str, id_col: str
) -> DataFrame:
    """One row per token position with columns ``_g1.._g{order}`` = xxhash64
    of the k-token window STARTING there (null when the window runs past
    the document end).

    r11: slice/arrays_zip projection, ZERO shuffles — the previous
    lead-window form paid a full Exchange+Sort of every corpus token just
    to line adjacent tokens up. ``arrays_zip`` pads its shorter inputs
    with nulls, which reproduces the lead-past-document-end semantics
    exactly (``concat_ws`` skips nulls; the ``when`` guard nulls the gram).
    The per-row expressions (slice/zip/explode/concat/xxhash64) are all
    codegen'd — this is NOT the interpreted transform-lambda formulation
    that lost the round-8 A/B. Hash strings are identical to the
    slice-based scoring hashes (``concat_ws`` over the same tokens)."""
    base = _tok_array(df, text_col, id_col)
    slices = [
        F.slice(
            "_toks", i + 1, F.greatest(F.size("_toks") - F.lit(i), F.lit(0))
        ).alias(f"_s{i}")
        for i in range(order)
    ]
    z = base.select(F.explode(F.arrays_zip(*slices)).alias("_z"))
    parts = [F.col(f"_z._s{i}") for i in range(order)]
    cols = []
    for k in range(1, order + 1):
        g = F.xxhash64(F.concat_ws(_SEP, *parts[:k]))
        if k > 1:
            g = F.when(parts[k - 1].isNotNull(), g)
        cols.append(g.alias(f"_g{k}"))
    return z.select(*cols)


class NGramLM:
    """A trained Stupid Backoff model: ``counts[k]`` is a DataFrame
    ``(gram_hash long, cnt long)`` for k-grams, ``k = 1..order``;
    ``total`` is the corpus token count (unigram denominator). Persists as
    one parquet table per order."""

    def __init__(self, order: int, counts: dict, total: int):
        self.order = order
        self.counts = counts
        self.total = total

    def save(self, path: str) -> None:
        for k, df in self.counts.items():
            df.write.mode("overwrite").parquet(f"{path}/grams_{k}")
        spark = next(iter(self.counts.values())).sparkSession
        meta = spark.createDataFrame(
            [(self.order, self.total)], "order int, total long"
        )
        meta.write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "NGramLM":
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        counts = {
            k: spark.read.parquet(f"{path}/grams_{k}")
            for k in range(1, meta["order"] + 1)
        }
        return cls(meta["order"], counts, meta["total"])


def train_ngram_lm(
    df: DataFrame,
    order: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> NGramLM:
    """One explode + groupBy per order over the reference corpus.
    ``min_count`` prunes rare grams of order >= 2 (pruning unigrams would
    bias the backoff base case): at 100 TB this is what makes the count
    tables broadcastable at scoring time, the standard entropy-pruning
    stand-in. Pruning keeps Stupid Backoff well-defined because a
    surviving k-gram's context count >= its own count, so the context row
    always survives too. The total token count is taken before pruning."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    wins = _all_order_window_hashes(df, order, text_col, id_col)
    if order > 1:
        # every order's counts read the same projection: materialize it once
        # instead of re-tokenizing the corpus per order
        wins = wins.localCheckpoint(eager=True)
    counts = {}
    total = 0
    for k in range(1, order + 1):
        grams = wins.select(F.col(f"_g{k}").alias("gram_hash")).filter(
            F.col("gram_hash").isNotNull()
        )
        c = grams.groupBy("gram_hash").agg(F.count(F.lit(1)).alias("cnt"))
        if k == 1:
            # one aggregation serves both the table and the total
            c = c.cache()
            total = c.agg(F.sum("cnt")).collect()[0][0] or 0
        elif min_count > 1:
            c = c.filter(F.col("cnt") >= min_count)
        counts[k] = c
    return NGramLM(order, counts, int(total))


def score_docs(
    df: DataFrame,
    lm: NGramLM,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool = True,
) -> DataFrame:
    """Per-document Stupid Backoff score: ``(id_col, n_scored_tokens,
    avg_logprob)`` where ``avg_logprob`` is the mean log10 backoff score
    over every token position, each scored with its longest available
    context (early positions use shorter contexts WITHOUT the alpha
    penalty — backoff penalizes unseen grams, not short prefixes). Higher
    (closer to 0) = more natural text under the reference corpus; filter
    or bucket on it like a perplexity. Out-of-vocabulary tokens score at
    the ``0.5 / N`` floor so the log stays defined.

    One projection computes, per position ``i``, the hash of the k-gram
    ending at ``i`` and of its (k-1)-token context for every k; then
    ``2*order - 1`` left joins against the count tables and a CASE cascade
    implement the backoff. No Python anywhere in the plan."""
    toks = _tok_array(df, text_col, id_col).filter(F.size("_toks") > 0)
    def _ending_hash(k: int):
        """Hash of the k-gram ending at position i (= _i0 + 1). Single
        tokens skip the slice+concat (concat_ws over a 1-slice is the
        token itself, so xxhash64(token) is hash-identical to training)."""
        if k == 1:
            return F.xxhash64(F.element_at("_toks", F.col("_i0") + 1))
        return F.xxhash64(
            F.concat_ws(_SEP, F.slice("_toks", F.col("_i0") + 2 - k, k))
        )

    gram_cols = []
    for k in range(1, lm.order + 1):
        gram_cols.append(
            F.when(F.col("_i0") + 1 >= k, _ending_hash(k)).alias(f"_g{k}")
        )
    for k in range(2, lm.order + 1):
        # context of the level-k gram = (k-1)-gram ending at i-1
        # = slice(start = i-k+1 = _i0+2-k, len = k-1)
        ctx = (
            F.xxhash64(F.element_at("_toks", F.col("_i0")))
            if k == 2
            else F.xxhash64(
                F.concat_ws(_SEP, F.slice("_toks", F.col("_i0") + 2 - k, k - 1))
            )
        )
        gram_cols.append(
            F.when(F.col("_i0") + 1 >= k, ctx).alias(f"_x{k}")
        )
    pos = toks.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode("_toks").alias("_i0", "_tok"),
    ).select(F.col(id_col), (F.col("_i0") + 1).alias("_i"), *gram_cols)
    maybe_b = F.broadcast if broadcast_counts else (lambda x: x)
    joined = pos
    for k in range(1, lm.order + 1):
        joined = joined.join(
            maybe_b(
                lm.counts[k].select(
                    F.col("gram_hash").alias(f"_g{k}"),
                    F.col("cnt").alias(f"_c{k}"),
                )
            ),
            on=f"_g{k}",
            how="left",
        )
    for k in range(2, lm.order + 1):
        joined = joined.join(
            maybe_b(
                lm.counts[k - 1].select(
                    F.col("gram_hash").alias(f"_x{k}"),
                    F.col("cnt").alias(f"_xc{k}"),
                )
            ),
            on=f"_x{k}",
            how="left",
        )
    # backoff cascade, built from the unigram base case upward; alpha only
    # applies where a full-length gram EXISTED to be unseen (i >= k)
    score = F.col("_c1").cast("double") / F.lit(float(max(lm.total, 1)))
    for k in range(2, lm.order + 1):
        full = F.col(f"_c{k}").cast("double") / F.col(f"_xc{k}").cast("double")
        seen = F.col(f"_c{k}").isNotNull() & F.col(f"_xc{k}").isNotNull()
        score = F.when(
            F.col("_i") >= k, F.when(seen, full).otherwise(F.lit(alpha) * score)
        ).otherwise(score)
    score = F.coalesce(score, F.lit(0.5 / float(max(lm.total, 1))))
    scored = joined.select(F.col(id_col), F.log10(score).alias("_lp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )


def importance_resample(
    df: DataFrame,
    target_lm: NGramLM,
    base_lm: NGramLM,
    k: int,
    alpha: float = 0.4,
    temperature: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): select ``k`` documents
    from a raw corpus with probability proportional to the importance
    weight ``p_target(x) / p_base(x)``, where both densities are n-gram
    LMs (here: two :class:`NGramLM` models scored with Stupid Backoff —
    train ``target_lm`` on a small high-quality/target-domain corpus and
    ``base_lm`` on a sample of the raw corpus itself).

    Sampling-without-replacement is the Gumbel-top-k trick: each doc gets
    key ``log w(x) + G`` with ``G = -log(-log u)`` and the top-k keys are
    an exact sample proportional-to-weights — and ``u`` here is a
    DETERMINISTIC md5-derived uniform (same rule as
    :mod:`~mlforecast_spark.operators.sampling`), so the selection is
    reproducible across cluster shapes. ``temperature`` flattens (>1) or
    sharpens (<1) the weight distribution.

    Returns the selected ``(id_col, log_weight, gumbel_key, rank)`` where
    ``log_weight`` is the NATURAL-log importance weight divided by
    ``temperature`` (score_docs' log10 scores are converted, so the
    Gumbel-top-k identity holds exactly). Cost: two scoring passes (each
    the join pipeline of :func:`score_docs`) plus one global top-k
    (planned as TakeOrderedAndProject — no full sort)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    st = score_docs(df, target_lm, alpha=alpha, text_col=text_col, id_col=id_col)
    sb = score_docs(df, base_lm, alpha=alpha, text_col=text_col, id_col=id_col)
    joined = st.select(
        F.col(id_col),
        (F.col("avg_logprob") * F.col("n_scored_tokens")).alias("_lt"),
    ).join(
        sb.select(
            F.col(id_col),
            (F.col("avg_logprob") * F.col("n_scored_tokens")).alias("_lb"),
        ),
        id_col,
    )
    # md5-derived uniform in (0, 1): first 12 hex digits / 16^12, floored
    # away from exact 0/1 so the double Gumbel transform stays finite
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12 + 1))
    # score_docs log-probs are log10; the Gumbel noise -log(-log u) is
    # natural-log, so convert the weight to natural log before adding noise —
    # otherwise selection is proportional to w^(1/ln 10), an implicit extra
    # temperature of ln 10
    logw = (
        (F.col("_lt") - F.col("_lb"))
        * F.lit(math.log(10.0))
        / F.lit(float(temperature))
    )
    keyed = joined.select(
        F.col(id_col),
        F.round(logw, 6).alias("log_weight"),
        F.round(logw - F.log(-F.log(u)), 6).alias("gumbel_key"),
    )
    # global top-k without a single-partition full sort: orderBy().limit(k)
    # plans as TakeOrderedAndProject; rank is assigned afterwards over the
    # k surviving rows only
    top = keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def perplexity_buckets(
    df: DataFrame,
    lm: NGramLM,
    fractions=(1 / 3, 1 / 3),
    by: str | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing by LM score (Wenzek et al.
    2020 §4.3: score every document under a reference-corpus LM, split the
    corpus at score quantiles, keep/weight buckets downstream). Returns
    ``(id_col, n_scored_tokens, avg_logprob, ppl_bucket)`` with
    ``ppl_bucket`` ∈ head/middle/tail — head = highest ``avg_logprob``
    (most natural text). ``fractions`` gives the head and middle mass;
    the tail takes the rest. ``by`` optionally computes quantiles within
    groups (CCNet buckets per language).

    Quantile cutoffs use exact ``percentile`` over the scored corpus —
    one aggregation (per group), broadcast back; the scoring pass itself
    is :func:`score_docs` (pure JVM backoff cascade). Ties at a cutoff
    fall into the better bucket deterministically."""
    head_f, mid_f = float(fractions[0]), float(fractions[1])
    if not (0 < head_f < 1 and 0 <= mid_f < 1 and head_f + mid_f < 1):
        raise ValueError(
            "fractions must be positive with head + middle < 1, got "
            f"{fractions!r}"
        )
    scored = score_docs(df, lm, alpha=alpha, text_col=text_col, id_col=id_col)
    # head = TOP head_f by avg_logprob -> cutoffs at the (1-head) and
    # (1-head-mid) quantiles
    q_head, q_mid = 1.0 - head_f, 1.0 - head_f - mid_f
    if by is not None:
        scored = scored.join(df.select(F.col(id_col), F.col(by)), id_col)
        cuts = scored.groupBy(by).agg(
            F.percentile("avg_logprob", q_head).alias("_c_head"),
            F.percentile("avg_logprob", q_mid).alias("_c_mid"),
        )
        scored = scored.join(F.broadcast(cuts), by)
    else:
        cuts = scored.agg(
            F.percentile("avg_logprob", q_head).alias("_c_head"),
            F.percentile("avg_logprob", q_mid).alias("_c_mid"),
        )
        scored = scored.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("_c_head"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("_c_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    keep = [id_col] + ([by] if by is not None else [])
    return scored.select(
        *keep, "n_scored_tokens", "avg_logprob", bucket.alias("ppl_bucket")
    )
