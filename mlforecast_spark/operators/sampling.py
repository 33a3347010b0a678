"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent: the
same call on the same data returns different rows when the file splits
change, which makes pipeline outputs unreproducible across cluster sizes.
These operators instead derive the sampling decision from a content hash
(md5 of the row key), so the selected set is a pure function of the data —
identical on 1 executor or 1000, re-runnable, and auditable in any engine
that has md5 (the DuckDB oracle computes the exact same set).

- ``hash_sample``: Bernoulli-style p-fraction keep, decided per row by the
  md5 hex prefix of the key. No shuffle at all — a pure filter that pushes
  down to the scan.
- ``stratified_hash_sample``: exactly ``k`` rows per group (e.g. per
  language / per source), the rows whose key-md5 sorts first within the
  group. One shuffle on the group key. At 100 TB, pre-filter with an
  over-sampled ``hash_sample`` first (the top-k by hash within a group is
  almost surely inside a generous hash-prefix slice), so the per-group sort
  sees a sliver of the corpus; ``prefilter_fraction`` automates this.
- ``mixture_sample``: domain-composition resampling — downsample (never
  upsample) each domain so the corpus matches a target mixture, decided by
  the same per-row hash rule (one tiny count agg + a broadcast-joined
  cutoff filter).
- ``hash_split``: deterministic train/val/test assignment by hash cutoffs
  (shuffle-free projection); key on the dedup cluster id for a
  leakage-safe split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 16^6 possible values of the first 6 md5 hex chars — the resolution of the
# Bernoulli threshold (p quantizes to ~6e-8 steps)
_HASH_SPACE = 16**6


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5(key) prefix — deterministic,
    shuffle-free, engine-portable. ``salt`` derives independent samples from
    the same keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cutoff_int = int(round(fraction * _HASH_SPACE))
    if cutoff_int >= _HASH_SPACE:
        # full keep: 16**6 formats to SEVEN hex chars, and a 6-char prefix
        # only sorts below it when it starts with '0' — so filtering would
        # silently keep ~1/16 of rows. No filter is the correct plan.
        return df
    # lowercase hex sorts like the integer it encodes, so the threshold is a
    # plain string compare — no base conversion in the hot path
    cutoff = format(cutoff_int, "06x")
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 6
    )
    return df.filter(prefix < F.lit(cutoff))


def stratified_hash_sample(
    df: DataFrame,
    group_cols: list,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group: the rows whose
    ``md5(key || salt)`` sorts first within the group (md5 of a unique key is
    collision-free in practice, so the selection is total-ordered and
    deterministic). Adds ``sample_rank`` (1-based within group).

    ``prefilter_fraction``: the 100 TB path. The winners are the k smallest
    hashes per group, and hashes are uniform — so with a group of size n,
    the k winners are inside the first ``p`` of hash space except with
    probability Binom(n, p) < k, vanishing for ``p >> k/n``. Passing e.g.
    ``p = 5 * k / min_group_size`` drops ~(1-p) of the corpus with a
    shuffle-free scan filter BEFORE the per-group sort, leaving the window
    over a sliver. The output is bit-identical to the unfiltered run
    whenever each group keeps >= k rows in the slice (a group can only
    return fewer rows — never different ones — if the slice under-covers
    it). Left None, the sort sees every row of each group; the shuffle is on
    ``group_cols`` either way."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    src = df
    if prefilter_fraction is not None:
        if not 0.0 < prefilter_fraction <= 1.0:
            raise ValueError(
                f"prefilter_fraction must be in (0, 1], got {prefilter_fraction}"
            )
        cutoff_int = int(round(prefilter_fraction * _HASH_SPACE))
        if cutoff_int < _HASH_SPACE:  # >= space = keep everything (see hash_sample)
            cutoff = format(cutoff_int, "06x")
            src = df.filter(F.substring(h, 1, 6) < F.lit(cutoff))
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h"))
    return (
        src.select("*", h.alias("_h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_h")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict,
    key_col: str = "doc_id",
    salt: str = "",
    scale: float = 1.0,
) -> DataFrame:
    """Downsample a corpus so its domain composition matches
    ``target_weights`` (e.g. ``{"web": 0.6, "code": 0.25, "books": 0.15}``)
    — the data-mixing step of a pretraining pipeline (The Pile / DoReMi
    style domain reweighting, by deletion only — no row is ever duplicated).

    The largest total size T consistent with the targets without upsampling
    is ``T = min_d n_d / w_d`` (the binding domain keeps all its rows);
    every other domain keeps fraction ``w_d * T / n_d``, decided per row by
    the md5 hash of the key — the same deterministic, partitioning-immune
    rule as :func:`hash_sample`, so the output is reproducible on any
    cluster shape. ``scale`` shrinks T (e.g. 0.5 = half-size corpus at the
    same mixture). Domains absent from ``target_weights`` are dropped;
    weights need not sum to 1 (they are normalized).

    Cost: one tiny count aggregation (rows = #domains, collected — the only
    driver action, inherent to computing the global mixture), then a
    broadcast join of per-domain cutoffs + scan-local filter. No data
    shuffle of the corpus itself."""
    if not target_weights:
        raise ValueError("target_weights must be a non-empty dict")
    if any(w < 0 for w in target_weights.values()):
        raise ValueError("target weights must be non-negative")
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"scale must be in (0, 1], got {scale}")
    tot_w = float(sum(target_weights.values()))
    if tot_w <= 0:
        raise ValueError("target weights must sum to > 0")
    w_norm = {d: w / tot_w for d, w in target_weights.items()}
    counts = {
        r["_d"]: r["_n"]
        for r in df.filter(F.col(domain_col).isin(list(w_norm)))
        .groupBy(F.col(domain_col).alias("_d"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    missing = [d for d in w_norm if d not in counts and w_norm[d] > 0]
    if missing:
        raise ValueError(
            f"domains in target_weights but absent from the data: {missing}"
        )
    t_max = min(counts[d] / w_norm[d] for d in counts if w_norm[d] > 0)
    t = t_max * scale
    cutoffs = []
    for d, n in counts.items():
        frac = min(1.0, (w_norm[d] * t) / n) if n else 0.0
        cutoff_int = int(round(frac * _HASH_SPACE))
        # full-keep sentinel: 'g' > every hex char, so the filter keeps all
        cut = "g" if cutoff_int >= _HASH_SPACE else format(cutoff_int, "06x")
        cutoffs.append((d, cut))
    spark = df.sparkSession
    from pyspark.sql import types as T

    cdf = F.broadcast(
        spark.createDataFrame(
            cutoffs,
            T.StructType(
                [
                    T.StructField(domain_col, df.schema[domain_col].dataType),
                    T.StructField("_cut", T.StringType()),
                ]
            ),
        )
    )
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 6
    )
    return (
        df.join(cdf, on=domain_col, how="inner")
        .filter(prefix < F.col("_cut"))
        .drop("_cut")
    )


def hash_split(
    df: DataFrame,
    weights: dict,
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is decided
    by where the md5 of its key falls among cumulative weight cutoffs — a
    pure projection (no shuffle, no sampling seed), reproducible across
    cluster shapes and engines, stable under corpus growth (adding rows
    never reassigns existing keys).

    To make the split leakage-safe under near-duplication, pass the dedup
    ``cluster_id`` as ``key_col`` (e.g. join
    :func:`~mlforecast_spark.operators.dedup.connected_components` output
    first): every member of a duplicate cluster then lands in the same
    split, so eval rows never have a near-copy in train."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    tot = float(sum(weights.values()))
    if tot <= 0:
        raise ValueError("weights must sum to > 0")
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 6
    )
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / tot
        cutoff = format(min(_HASH_SPACE - 1, int(round(acc * _HASH_SPACE))), "06x")
        cond = prefix < F.lit(cutoff)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
    size_col: str | None = None,
) -> dict:
    """Temperature-based mixture targets: ``w_d ∝ n_d^alpha`` — the
    multilingual/multi-domain rebalancing rule (mBERT/XLM-R's exponential
    smoothing; ``alpha=1`` keeps the natural distribution, ``alpha=0`` is
    uniform, the usual 0.2-0.7 range upweights small domains). ``size_col``
    weighs domains by a size column (e.g. token counts) instead of rows.

    One tiny per-domain aggregation (the same single sanctioned driver
    action as :func:`mixture_sample`, whose ``target_weights`` this
    feeds); the returned dict is normalized."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    agg = (
        F.sum(F.col(size_col)) if size_col is not None else F.count(F.lit(1))
    )
    rows = df.groupBy(domain_col).agg(agg.alias("_n")).collect()
    if not rows:
        raise ValueError("temperature_weights: empty corpus")
    raw = {r[domain_col]: float(r["_n"]) ** float(alpha) for r in rows}
    tot = sum(raw.values())
    return {d: w / tot for d, w in raw.items()}


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    budgets: dict,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
    prefilter_safety: float | None = 4.0,
) -> DataFrame:
    """Deterministic per-domain sampling to a TOKEN budget — the unit real
    pretraining mixtures are specified in ("60B web tokens, 15B code
    tokens"), where :func:`mixture_sample` works in document fractions.
    Within each domain, documents are taken in md5(id) order (reproducible
    on any cluster shape, like :func:`hash_sample`) while the running token
    total stays at or below the domain's budget; the first document of a
    domain is always taken even if it alone exceeds the budget (a budget
    that admits nothing is almost always a configuration error). Domains
    absent from ``budgets`` are dropped. A NULL token count is rejected at
    execution time (``raise_error``) — silently treating unknown-length
    documents as free would blow the budget downstream.

    Scale shape — the 100 TB path is ON by default (``prefilter_safety``):
    the greedy take is a prefix of the md5 order, and md5 prefixes are
    uniform, so per domain only the hash slice ``p ≈ safety × budget /
    domain_tokens`` can contain winners. Two tiny per-domain aggregations
    (the same sanctioned driver action as :func:`mixture_sample`) derive
    the slice cutoffs and VERIFY coverage: any domain whose slice holds ≤
    budget tokens without holding the whole domain falls back to the full
    window, so the output is always bit-identical to
    ``prefilter_safety=None`` — the sliver either provably covers the take
    or isn't used. The per-domain window cumsum then sorts the sliver (a
    few × budget of tokens), not the domain: a 10-domain / 100 TB corpus no
    longer funnels whole domains through single reducers.
    ``prefilter_safety=None`` skips the aggregations and sorts every row of
    each domain (the round-6 behavior). Returns the surviving rows with
    their original columns."""
    if not budgets:
        raise ValueError("budgets must be a non-empty dict")
    if any(b < 0 for b in budgets.values()):
        raise ValueError("token budgets must be non-negative")
    if prefilter_safety is not None and prefilter_safety <= 1.0:
        raise ValueError(
            f"prefilter_safety must be > 1 (or None), got {prefilter_safety}"
        )
    spark = df.sparkSession
    bdf = F.broadcast(
        spark.createDataFrame(
            [(str(k), int(v)) for k, v in budgets.items()],
            f"{domain_col} string, _budget long",
        )
    )
    tok = F.when(
        F.col(token_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"token_budget_sample: NULL {token_col} for {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col(token_col).cast("long"))
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    src = df.join(bdf, on=domain_col)
    if prefilter_safety is not None:
        # pass 1: domain token totals (rows = #domains)
        totals = {
            r["_d"]: int(r["_t"])
            for r in src.groupBy(F.col(domain_col).alias("_d"))
            .agg(F.sum(tok).alias("_t"))
            .collect()
        }
        cuts = {}
        for d, t in totals.items():
            b = int(budgets[d])
            if t <= 0 or b >= t:
                cuts[d] = "g"  # keep-all sentinel: 'g' > every hex char
            else:
                frac = min(1.0, prefilter_safety * b / t)
                ci = int(round(frac * _HASH_SPACE))
                cuts[d] = "g" if ci >= _HASH_SPACE else format(ci, "06x")
        in_slice = F.substring(h, 1, 6) < F.col("_cut")
        # pass 2: verify each slice covers its take — slice token sum must
        # EXCEED the budget (then the first over-budget doc is inside the
        # slice, so every taken doc is) unless the slice is the whole domain
        cov = {
            r["_d"]: (int(r["_st"] or 0), int(r["_sn"]), int(r["_n"]))
            for r in src.withColumn("_cut", _cut_join(spark, cuts, domain_col))
            .groupBy(F.col(domain_col).alias("_d"))
            .agg(
                F.sum(F.when(in_slice, tok)).alias("_st"),
                F.count(F.when(in_slice, F.lit(1))).alias("_sn"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        }
        for d, (st, sn, n) in cov.items():
            if sn < n and st <= int(budgets[d]):
                cuts[d] = "g"  # under-covered: full window for this domain
        src = src.withColumn("_cut", _cut_join(spark, cuts, domain_col)).filter(
            in_slice
        )
    w = Window.partitionBy(domain_col).orderBy(h, F.col(id_col))
    return (
        src.withColumn("_cum", F.sum(tok).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_cum") <= F.col("_budget")) | (F.col("_rn") == 1))
        .drop("_budget", "_cum", "_rn", "_cut")
    )


def _cut_join(spark, cuts: dict, domain_col: str):
    """Per-domain hash-prefix cutoff as a broadcast CASE expression (tiny —
    one branch per domain), so the slice filter stays a scan-local
    predicate."""
    expr = F.lit(None).cast("string")
    for d, c in cuts.items():
        expr = F.when(F.col(domain_col) == F.lit(d), F.lit(c)).otherwise(expr)
    return expr
