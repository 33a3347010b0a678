"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL expressions (JVM, codegen) — no Python
UDFs. Designed for the `documents` table schema
(doc_id, text, lang, source, n_chars) but parameterized.

Per-row statistics (counts / ratios / fingerprint) are a single projection
over one corpus scan. Language-marker scores run as ONE tokenize → filter →
aggregate pass joined back by id: at sf1 this is ~40% faster than the
20-per-marker replace/length string passes it replaced (scores-only 1.04 s
vs 1.78 s, full profile 4.2 s vs 5.5 s, 5 interleaved warm reps), because
the marker-token stream after the filter is a sliver of the corpus and the
20 full-text scans collapse into one split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import spread_scan

# deterministic, SQL-expressible punctuation set; PUNCT_CHARS feeds
# F.translate, which char-maps without a regex engine
PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"
PUNCT_CHARS = ".,;:!?'\"()[]{}-"

# tiny per-language stopword marker sets; scores are exact counts of tokens
# equal to a marker word under whitespace tokenization — the same value is
# computable in any SQL engine with a regex split (DuckDB:
# list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t IN (...)))
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _raw_count_cols(text: Column) -> list[Column]:
    """Stage-1 counts, each computed exactly once: the ratios in stage 2
    reference these as attributes. F.translate (char map) replaces the
    punctuation regex — same count, no regex engine."""
    n_chars = F.length(text)
    return [
        n_chars.cast("long").alias("n_chars"),
        token_count(text).cast("long").alias("n_tokens"),
        (n_chars - F.length(F.translate(text, PUNCT_CHARS, ""))).alias("_n_punct"),
        (n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))).alias("_n_spaces"),
    ]


def _ratio_cols() -> list[Column]:
    """Stage-2 ratios over the stage-1 count attributes."""
    n_chars, n_tokens = F.col("n_chars"), F.col("n_tokens")
    n_punct, n_spaces = F.col("_n_punct"), F.col("_n_spaces")
    return [
        F.round(
            F.when(n_tokens > 0, (n_chars - n_spaces) / n_tokens).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_chars > 0, n_spaces / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("space_ratio"),
    ]


def _marker_score_agg(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-id marker-token counts for every language in ONE pass:
    tokenize → keep only the 20 marker tokens → 4 conditional SUMs. The
    filter discards ~all of the token stream before the aggregation, so the
    shuffle moves marker hits only; docs with no hits are absent (callers
    left-join + coalesce to 0).

    Kept for the duplicate-id grouping semantics (scores summed across rows
    sharing an id); the per-row formulation below (`_marker_hits_col` +
    `_marker_score_cols`) replaces it inside ``text_profile`` /
    ``language_scores``, where rows are per-document."""
    all_words = [w for words in LANG_MARKERS.values() for w in words]
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_tok"),
    ).filter(F.col("_tok").isin(all_words))
    aggs = [
        F.sum(F.col("_tok").isin(*words).cast("int")).alias(f"_s_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    return toks.groupBy(id_col).agg(*aggs)


def _marker_hits_col(text: Column) -> Column:
    """Marker tokens of one document as an array column: tokenize (same
    ``split(lower(text), '\\s+')`` stream as ``_marker_score_agg``) and keep
    only the 20 marker tokens. One interpreted-HOF pass over the token
    array; materialize it as a column (NOT inline) so CollapseProject keeps
    it and the four per-language counts below scan the filtered handful of
    hits instead of re-filtering the full stream."""
    all_words = [w for words in LANG_MARKERS.values() for w in words]
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: t.isin(*all_words)
    )


def _marker_score_cols(hits: Column) -> list[Column]:
    """Per-row language scores over a `_marker_hits_col` array — the r11
    replacement for the explode → filter → two-level groupBy → shuffle →
    left-join formulation (optimization guide §2.4: remove shuffles
    outright). The old plan scanned and round-robin-exchanged the corpus
    TWICE (the left join pushed ``isnotnull(id)`` into only one exchange
    subtree, so AQE could not reuse the scan — measured at the 100x bench
    scale: two 85 MB corpus exchanges plus an (id, 4 sums) shuffle and a
    join, vs ONE corpus pass and zero joins here). Values: long counts of
    tokens in each language's marker set, 0 for docs with no hits —
    identical to the old sum/coalesce for per-document rows (null text
    coalesces to 0 like the old explode-drops-row path; rows sharing an id
    now score their OWN text instead of the group's sum, which is the
    documented per-document contract)."""
    zero = F.lit(0).cast("long")
    return [
        F.coalesce(
            F.aggregate(
                hits, zero, lambda acc, t: acc + t.isin(*words).cast("long")
            ),
            zero,
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def _coalesced_score_cols() -> list[Column]:
    return [
        F.coalesce(F.col(f"_s_{lang}"), F.lit(0)).alias(f"score_{lang}")
        for lang in LANG_MARKERS
    ]


def _guess_col() -> Column:
    """Argmax over the score_* attributes of a previous projection. The
    scores MUST be attributes here, not inlined expressions: each one is
    referenced several times by the argmax chain, and outside whole-stage
    codegen (which bails past its method-size limit on wide profiles) an
    interpreted projection re-evaluates every duplicated subtree — measured
    at sf1, inlining turned a 0.3 s profile into a 5 s one. Keeping the
    scores one projection below also stops CollapseProject from inlining
    them (it keeps non-cheap, multiply-referenced expressions)."""
    langs = list(LANG_MARKERS)
    guess = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cand = F.col(f"score_{lang}")
        guess = F.when(cand > best, F.lit(lang)).otherwise(guess)
        best = F.when(cand > best, cand).otherwise(best)
    return F.when(best > 0, guess).otherwise(F.lit("unknown")).alias("lang_guess")


def _fingerprint_col(text: Column, lowered: Column | None = None) -> Column:
    """``lowered`` may be any already-lowercased variant of the text.

    Canonical form = the lowercased alphanumeric TOKEN STREAM joined by
    single spaces (``regexp_extract_all('[a-z0-9]+')`` + join). Measured at
    sf10 (500k docs, ~1 GB text): 2.3 s vs 24 s for the regexp_replace
    character-deletion form — Spark's regexp_replace rebuilds the string
    through the Java regex appendReplacement machinery per match, while
    extract_all just scans; same one-scan plan shape in DuckDB
    (regexp_extract_all + array_to_string)."""
    if lowered is None:
        lowered = F.lower(text)
    toks = F.regexp_extract_all(lowered, F.lit(r"[a-z0-9]+"), 0)
    return F.md5(F.array_join(toks, " ")).alias("fingerprint")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring statistics per document: char/token counts, average
    token length, punctuation and whitespace ratios. Pure per-row
    projection; the scan is spread so the regex counting isn't pinned to
    the parquet row-group count (``utils.spread_scan``)."""
    df = spread_scan(df.select(F.col(id_col), F.col(text_col)))
    stage1 = df.select(F.col(id_col), *_raw_count_cols(F.col(text_col)))
    return stage1.select(
        F.col(id_col), "n_chars", "n_tokens", *_ratio_cols()
    )


def language_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token counts per language + argmax guess (n-gram-heuristic
    language ID). Pure per-row projection (r11, see ``_marker_score_cols``):
    one corpus pass, no shuffle, no join; ties broken by language order."""
    base = df.select(
        F.col(id_col), _marker_hits_col(F.col(text_col)).alias("_mk")
    )
    return base.select(F.col(id_col), *_marker_score_cols(F.col("_mk"))).withColumn(
        "lang_guess", _guess_col()
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the lowercased alphanumeric TOKEN
    STREAM joined by single spaces (see ``_fingerprint_col`` — reproducible
    in any engine as ``md5(array_to_string(regexp_extract_all(lower(text),
    '[a-z0-9]+'), ' '))``; NOT the old character-deletion regexp_replace
    form, which merges tokens across punctuation)."""
    return df.select(F.col(id_col), _fingerprint_col(F.col(text_col)))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token stats + language ID + fingerprint: ONE per-row projection over
    a single corpus scan — the plan to run at 100 TB. r11: the marker
    scores moved from a tokenize→filter→groupBy→left-join leg into the same
    projection (`_marker_score_cols`). The old two-leg plan was supposed to
    share the spread corpus exchange via AQE stage reuse, but the left join
    pushed ``isnotnull(id)`` into only the aggregation leg's exchange
    subtree, so the corpus was scanned AND round-robin-exchanged twice
    (measured at the 100x bench scale: two 85 MB exchanges + an (id, sums)
    shuffle + a join — all gone here; sf10 warm min 7.9 s -> see
    OPTIMIZATION_r11.md).

    The single scan is spread (``utils.spread_scan``): a row-group-starved
    scan pins the regex/tokenize projection to a handful of tasks."""
    text = F.col(text_col)
    df = spread_scan(df.select(F.col(id_col), F.col(text_col)))
    stage1 = df.select(
        F.col(id_col),
        *_raw_count_cols(text),
        _fingerprint_col(text),
        _marker_hits_col(text).alias("_mk"),
    )
    scored = stage1.select(
        F.col(id_col),
        "n_chars",
        "n_tokens",
        *_ratio_cols(),
        *_marker_score_cols(F.col("_mk")),
        "fingerprint",
    )
    return scored.select(
        F.col(id_col),
        "n_chars",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "space_ratio",
        *[f"score_{lang}" for lang in LANG_MARKERS],
        _guess_col(),
        "fingerprint",
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals per document (the MassiveText /
    Gopher-style filters: highly repetitive documents are boilerplate or
    spam and get dropped before training):

    - ``type_token_ratio``: distinct tokens / tokens (low = repetitive)
    - ``top_token_frac``: share of the single most frequent token
    - ``dup_bigram_frac``: fraction of 2-gram instances that are repeats of
      an earlier 2-gram (0 = all distinct)

    Shape: tokenize once, count per (id, token) — Spark's partial
    aggregation collapses the explosion map-side, so the shuffle carries one
    row per distinct (id, token), not per token instance; same for bigrams
    (built with a per-doc lead window over token positions). Two small
    aggregates joined back by id — no full-text string rescans.

    Measured dead end (round 8, do not retry): a zero-shuffle pure-array
    projection of all four signals (array_distinct sizes + a sorted
    run-length ``aggregate`` for the top token + indexed-``transform``
    bigrams) looked strictly better on paper but ran ~100x slower — Spark
    evaluates higher-order-function LAMBDAS interpreted (outside
    whole-stage codegen), and the combined projection re-tokenizes per
    signal; the exploded hash aggregates here are fully codegen'd and the
    shuffles are distinct-token-sized, not corpus-sized.

    r11: the bigrams no longer use a lead window (which paid an
    Exchange+Sort of every token — a corpus-sized shuffle — just to pair
    adjacent tokens); they come from a lambda-free slice/arrays_zip
    projection over the token array, the same rewrite as the dedup shingle
    builder. ``trim`` before split makes the array exactly the
    length-filtered token sequence, so the pairs are identical.

    All three legs (token counts, bigram counts, id join-back) read the
    spread corpus frame (``utils.spread_scan``): the scan is unpinned from
    the parquet row-group count, and AQE stage reuse makes the legs share
    ONE corpus read. Every aggregate here is integer-valued, so the
    partition-order change cannot move any result."""
    df = spread_scan(df.select(F.col(id_col), F.col(text_col)))
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_pos", "_tok"),
    ).filter(F.length("_tok") > 0)
    tok_counts = toks.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    tok_stats = tok_counts.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_types"),
        F.max("_c").alias("_top"),
    )
    # strip leading/trailing \s with a regexp (F.trim only strips spaces —
    # a tab-leading doc would otherwise contribute an empty first token the
    # window form filtered out), so the array is exactly the
    # length-filtered token sequence
    tarr = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"^\s+|\s+$", ""), r"\s+"
    )
    bcnt = F.greatest(F.size("_tarr") - F.lit(1), F.lit(0))
    bigrams = (
        df.select(F.col(id_col), tarr.alias("_tarr"))
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice("_tarr", 1, bcnt).alias("_a"),
                    F.slice("_tarr", 2, bcnt).alias("_b"),
                )
            ).alias("_z"),
        )
        .select(
            F.col(id_col), F.concat_ws(" ", "_z._a", "_z._b").alias("_bg")
        )
    )
    bg_counts = bigrams.groupBy(id_col, "_bg").agg(F.count(F.lit(1)).alias("_c"))
    bg_stats = bg_counts.groupBy(id_col).agg(
        F.sum("_c").alias("_nbg"), F.count(F.lit(1)).alias("_dbg")
    )
    merged = df.select(F.col(id_col)).join(tok_stats, id_col, "left").join(
        bg_stats, id_col, "left"
    )
    return merged.select(
        F.col(id_col),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_tokens"),
        F.round(
            F.when(F.col("_n") > 0, F.col("_types") / F.col("_n")).otherwise(F.lit(0.0)), 6
        ).alias("type_token_ratio"),
        F.round(
            F.when(F.col("_n") > 0, F.col("_top") / F.col("_n")).otherwise(F.lit(0.0)), 6
        ).alias("top_token_frac"),
        F.round(
            F.when(
                F.col("_nbg") > 0, (F.col("_nbg") - F.col("_dbg")) / F.col("_nbg")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )


# GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit runs,
# punctuation runs, whitespace) — Java regex with Unicode categories; counts
# approximate a BPE tokenizer's pre-split sequence length without a vocab
BPE_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count: the number of GPT-2 pre-tokenizer pieces
    (each piece maps to >=1 BPE tokens, so this is a vocabulary-free lower
    bound that tracks real tokenizer counts closely on natural text). One
    JVM ``regexp_count`` pass — no Python, no vocab broadcast."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN))


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace and BPE-ish token counts per document — the two sizing
    numbers a training-data pipeline budgets by (corpus tokens, per-doc
    length cutoffs)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(text).cast("long").alias("n_ws_tokens"),
        bpe_token_count(text).cast("long").alias("n_bpe_tokens"),
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Lines that appear in >= ``min_docs`` distinct documents (C4-style
    boilerplate detection: cookie banners, nav text, license footers repeat
    across pages; real content doesn't). Returns (line_hash, line, n_docs).

    Counted per md5 of the trimmed lowercased line; the groupBy shuffles one
    row per distinct (line_hash, doc) after map-side collapse."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), line_sep)).alias("_line"),
    ).filter(F.length(F.trim("_line")) > 0)
    normed = lines.select(
        F.col(id_col),
        F.col("_line"),
        F.md5(F.trim(F.lower(F.col("_line")))).alias("line_hash"),
    )
    return (
        normed.groupBy("line_hash")
        .agg(
            F.first("_line").alias("line"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Strip boilerplate lines (per :func:`boilerplate_lines`) from every
    document and reassemble the text in original line order — blank /
    whitespace-only lines (paragraph separators) are preserved, never
    treated as boilerplate. Documents that become empty are kept with empty
    text (filter downstream if desired).

    Shape: explode lines with position → left-anti join against the
    boilerplate line-hash set (small: distinct repeated lines only — at
    100 TB broadcast it or leave it to AQE) → per-doc ordered reassembly via
    ``sort_array(collect_list(struct(pos, line)))`` — one groupBy, no window.
    All original non-text columns are preserved via the join back by id."""
    bp = boilerplate_lines(
        df, text_col=text_col, id_col=id_col, min_docs=min_docs, line_sep=line_sep
    ).select("line_hash")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("_pos", "_line"),
    )
    # blank lines get a null hash: an equi-anti-join never matches null, so
    # paragraph separators always survive
    kept = lines.withColumn(
        "line_hash",
        F.when(
            F.length(F.trim("_line")) > 0, F.md5(F.trim(F.lower(F.col("_line"))))
        ),
    ).join(bp, on="line_hash", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            line_sep,
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_clean_text")
    )
    return (
        df.drop(text_col)
        .join(rebuilt, on=id_col, how="left")
        .withColumn(text_col, F.coalesce(F.col("_clean_text"), F.lit("")))
        .drop("_clean_text")
    )


# conservative, engine-portable PII patterns (Java regex); each is a single
# regexp pass over the text
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"(?<![\d-])(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}(?![\d-])",
}


def pii_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts (emails / IPv4s / phone-like numbers) —
    one ``regexp_count`` pass per pattern, used to route documents to
    scrubbing or exclusion."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict | None = None,
) -> DataFrame:
    """Replace PII matches with ``<NAME>`` placeholders in-place (email →
    ``<EMAIL>`` etc.), keeping every other column. Chained
    ``regexp_replace`` — one projection, no shuffle, safe to push before
    any dedup/fingerprint stage (placeholders are deterministic, so
    scrubbed duplicates still collide)."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = F.col(text_col)
    for name, pat in pats.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return df.withColumn(text_col, out)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 200_000,
    max_punct_ratio: float = 0.25,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    min_type_token_ratio: float = 0.15,
    max_dup_bigram_frac: float = 0.4,
) -> DataFrame:
    """Gopher-style document quality gate in one call: joins the per-row
    stats (:func:`token_stats`) with the repetition signals
    (:func:`repetition_stats`) and emits ``keep`` plus a ``drop_reasons``
    array naming every failed rule — auditability is the point (corpus
    curation reviews WHY documents were dropped, not just how many).

    Two passes over the corpus total (the per-row projection and the
    repetition aggregation), joined by id; thresholds follow the Gopher
    paper's shape with permissive defaults — tune per corpus."""
    stats = token_stats(df, text_col=text_col, id_col=id_col)
    reps = repetition_stats(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col),
        "type_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
    )
    j = stats.join(reps, id_col, "left")
    rules = [
        ("too_few_tokens", F.col("n_tokens") < min_tokens),
        ("too_many_tokens", F.col("n_tokens") > max_tokens),
        ("punct_heavy", F.col("punct_ratio") > max_punct_ratio),
        ("tokens_too_short", F.col("avg_token_len") < min_avg_token_len),
        ("tokens_too_long", F.col("avg_token_len") > max_avg_token_len),
        ("repetitive_vocab", F.col("type_token_ratio") < min_type_token_ratio),
        ("repetitive_bigrams", F.col("dup_bigram_frac") > max_dup_bigram_frac),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules]
        ),
        lambda x: x.isNotNull(),
    )
    return j.select(
        F.col(id_col),
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "type_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
        reasons.alias("drop_reasons"),
    ).withColumn("keep", F.size("drop_reasons") == 0)


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide top-k n-grams with occurrence and document counts —
    the corpus-analysis staple (boilerplate discovery, contamination
    screening, tokenizer-vocab sanity checks). Reuses the dedup shingle
    machinery; the heavy aggregation is one groupBy(ngram) with map-side
    partial counts, then a single ``k``-row ordered take."""
    from .dedup import _exploded_shingles

    sh = _exploded_shingles(df, text_col, id_col, n, distinct=False)
    counts = sh.groupBy(F.col("shingle").alias("ngram")).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("ngram")
    ).limit(k)


URL_PATTERN = r"https?://[^\s/$.?#][^\s]*"


def url_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Top-k domains referenced across the corpus: extract URLs
    (``regexp_extract_all``), parse the host with ``parse_url`` (JVM), count
    occurrences and distinct documents per domain. Web-corpus curation uses
    this to spot over-represented link farms before training."""
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)).alias(
            "url"
        ),
    )
    hosts = urls.select(
        F.col(id_col), F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("domain")
    ).filter(F.col("domain").isNotNull())
    return (
        hosts.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.col("n_urls").desc(), F.col("domain"))
        .limit(k)
    )


# feature set for the trainable quality classifier: the engineered signals
# already computed by token_stats/repetition_stats, with log1p on the two
# unbounded counts so the IRLS Gram matrix stays well-conditioned
QUALITY_CLASSIFIER_FEATURES = [
    "log_n_chars",
    "log_n_tokens",
    "avg_token_len",
    "punct_ratio",
    "space_ratio",
    "type_token_ratio",
    "top_token_frac",
    "dup_bigram_frac",
]


def quality_feature_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc numeric feature vector for the quality classifier:
    :func:`token_stats` + :func:`repetition_stats` joined by id (two corpus
    scans total, both with map-side partial aggregation)."""
    ts = token_stats(df, text_col, id_col)
    rs = repetition_stats(df, text_col, id_col).drop("n_tokens")
    return ts.join(rs, id_col).select(
        F.col(id_col),
        F.log1p(F.col("n_chars").cast("double")).alias("log_n_chars"),
        F.log1p(F.col("n_tokens").cast("double")).alias("log_n_tokens"),
        "avg_token_len",
        "punct_ratio",
        "space_ratio",
        "type_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
    )


class QualityClassifier:
    """Trainable document-quality classifier (fastText-classifier analog on
    engineered signals): logistic regression over the
    :data:`QUALITY_CLASSIFIER_FEATURES` vector, trained with the engine's
    distributed IRLS (`models.LogisticRegression.fit_spark` — one JVM
    aggregation per Newton step, no data collect).

    The pretraining-pipeline pattern: label a small seed set (e.g. curated
    reference pages = 1, random crawl = 0), ``fit`` on it, then ``score``
    the full corpus — scoring is a pure Column expression over the feature
    projection (the model is ~9 broadcast constants), so the 100 TB pass is
    two scans + one join, no Python."""

    def __init__(self, max_iter: int = 50, l2: float = 1e-4):
        from ..models import LogisticRegression

        self.lr = LogisticRegression(max_iter=max_iter, l2=l2)
        self.feature_cols = list(QUALITY_CLASSIFIER_FEATURES)

    def fit(
        self,
        labeled: DataFrame,
        label_col: str = "label",
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "QualityClassifier":
        feats = quality_feature_frame(labeled, text_col, id_col)
        train = feats.join(
            labeled.select(F.col(id_col), F.col(label_col).cast("double")), id_col
        )
        self.lr.fit_spark(train, self.feature_cols, label_col)
        return self

    def score(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """``(id_col, quality_prob)`` — P(high quality) per document."""
        if self.lr.coef_ is None:
            raise RuntimeError("QualityClassifier.score before fit")
        feats = quality_feature_frame(df, text_col, id_col)
        return feats.select(
            F.col(id_col),
            F.round(self.lr.predict_proba_col(self.feature_cols), 6).alias(
                "quality_prob"
            ),
        )

    def filter(
        self,
        df: DataFrame,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Keep documents scoring at or above ``threshold`` (semi-join by id
        — document payloads never enter the scoring shuffle)."""
        keep = self.score(df, text_col, id_col).filter(
            F.col("quality_prob") >= threshold
        )
        return df.join(keep.select(id_col), id_col, "left_semi")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the step
    before an embedding pass (each chunk small enough for an encoder, the
    overlap preserving cross-boundary context). Returns one row per chunk:
    ``(id_col, chunk_id, chunk_start, n_chunk_tokens, chunk_text)`` with
    ``chunk_start`` the 0-based token offset and ``chunk_id`` 0-based per
    document; ``chunk_text`` is the whitespace-normalized token slice.

    Pure expressions: tokenize once per doc, ``sequence`` over chunk
    starts (stride = chunk_tokens - overlap), ``slice`` + ``array_join``
    per chunk — no shuffle at all; the operator is a projection and scales
    with the scan."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
        ).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    # chunk starts: 0, stride, 2*stride, ... while start < n (last chunk may
    # be short; a doc shorter than chunk_tokens yields exactly one chunk)
    n_chunks = F.greatest(
        F.ceil((F.size("_toks") - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    )
    exploded = toks.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int") - 1),
                lambda c: c * stride,
            )
        ).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("_start").cast("int").alias("chunk_start"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rsd: float = 0.02,
) -> DataFrame:
    """One-row corpus profile via sketches — the numbers a 100 TB ingest
    budgets by, in ONE aggregation pass over the token stream plus one over
    the docs: doc count, total/whitespace token count, approx distinct
    vocabulary (HyperLogLog++, ``approx_count_distinct`` with relative
    error ``rsd``), type-token ratio estimate, and per-doc token-length
    quantiles (``percentile_approx`` — Greenwald-Khanna, bounded memory).
    Exact distinct-vocab at corpus scale is a full shuffle of every token;
    the sketches keep this a map-side-combinable aggregate."""
    # only the vocabulary sketch needs the exploded token stream; per-doc
    # token counts are a plain expression, so the expensive split+explode
    # over the corpus runs ONCE, not once per aggregate
    vocab_stats = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .agg(F.approx_count_distinct("word", rsd=rsd).alias("approx_vocab"))
    )
    per_doc = df.select(
        F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("_n")
    ).filter(F.col("_n") > 0)
    doc_stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("n_tokens"),
        F.percentile_approx("_n", [0.5, 0.9, 0.99], 10_000).alias("_qs"),
        F.avg("_n").alias("mean_doc_tokens"),
    )
    return doc_stats.crossJoin(vocab_stats).select(
        "n_docs",
        "n_tokens",
        "approx_vocab",
        (F.col("approx_vocab") / F.col("n_tokens")).alias("type_token_ratio_est"),
        "mean_doc_tokens",
        F.col("_qs")[0].alias("p50_doc_tokens"),
        F.col("_qs")[1].alias("p90_doc_tokens"),
        F.col("_qs")[2].alias("p99_doc_tokens"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query terms
    (Lucene idf variant, always non-negative). The retrieval-scoring staple
    of data curation: rank a corpus against a benchmark prompt set before
    decontamination review, pull topical subsets for targeted mixtures, or
    seed DSIR-style selection with a retrieval signal instead of an LM.

    Returns ``(id_col, bm25)`` for EVERY input document (0.0 when no query
    term occurs). Tokenization is lowercased whitespace splitting — the same
    convention as :func:`token_stats` and the dedup shingle machinery.

    Scale shape (100 TB): the token explode is one projection pass; document
    lengths partial-aggregate per id; tokens are filtered to the query
    vocabulary BEFORE any shuffle, so the tf groupBy moves only matching
    terms; per-term document frequencies and the (N, avgdl) scalar row are
    broadcast. No driver-side actions, no Python UDFs.
    """
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one non-blank term")
    did = F.col(id_col)
    toks = spread_scan(df.select(did, F.col(text_col))).select(
        did,
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    if len(terms) <= 32:
        # pivoted fast path (r11): for a small fixed query vocabulary the
        # per-(id, term) shuffle shape is overkill — ONE doc-keyed
        # aggregation computes the doc length AND every term's tf as
        # count_if columns (one corpus explode instead of two), then one
        # tiny global aggregate yields (N, avgdl) plus every term's
        # document frequency, broadcast as a single row. Scoring becomes a
        # pure projection. tf=0 terms contribute an exact +0.0 (idf is
        # finite, the tf factor is 0), so the fixed-order expression sum
        # equals the general path's per-row SUM up to the same last-ulp
        # reassociation the cross-engine oracle already tolerates.
        per_doc = toks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("_dl"),
            *[
                F.sum((F.col("_tok") == t).cast("long")).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        gstats = per_doc.agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg("_dl").alias("_avgdl"),
            *[
                F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
                for i in range(len(terms))
            ],
        )
        score = F.lit(0.0)
        for i in range(len(terms)):
            idf_i = F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
                / (F.col(f"_df{i}") + F.lit(0.5))
            )
            tfn_i = (F.col(f"_tf{i}") * (k1 + 1)) / (
                F.col(f"_tf{i}")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            )
            score = score + F.when(
                F.col(f"_tf{i}") > 0, idf_i * tfn_i
            ).otherwise(F.lit(0.0))
        scored = per_doc.crossJoin(F.broadcast(gstats)).select(
            did, score.alias("_bm25")
        )
        return df.select(did).join(scored, id_col, "left").select(
            did, F.coalesce(F.col("_bm25"), F.lit(0.0)).alias("bm25")
        )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        toks.filter(F.col("_tok").isin(terms))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf_norm = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "_tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * tf_norm).alias("_bm25"))
    )
    return df.select(did).join(scored, id_col, "left").select(
        did, F.coalesce(F.col("_bm25"), F.lit(0.0)).alias("bm25")
    )


def bm25_top_k(
    df: DataFrame,
    query_terms,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by :func:`bm25_scores`, deterministically
    tie-broken by id — planned as a TakeOrderedAndProject (per-partition
    top-k then a k-row merge), never a full sort of the corpus."""
    scored = bm25_scores(df, query_terms, text_col, id_col, k1, b)
    return (
        scored.filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def profile_quality_bm25(
    df: DataFrame,
    query_terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    min_tokens: int = 20,
    max_tokens: int = 200_000,
    max_punct_ratio: float = 0.25,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    min_type_token_ratio: float = 0.15,
    max_dup_bigram_frac: float = 0.4,
) -> DataFrame:
    """Plan-fusion of ``text_profile`` + ``quality_filter`` + ``bm25_scores``
    for the combined curation profile: same output values as the three-way
    join of those calls (for corpora with non-null, unique ids), computed
    from TWO corpus scans and ONE gram shuffle instead of ~8 scans and 6+
    doc-keyed shuffles.

    How the legs collapse:

    - The per-row signals (counts, ratios, fingerprint) are one projection
      scan, exactly as in ``text_profile``.
    - Every aggregation signal — distinct-token stats, bigram stats, marker
      scores, BM25 term frequencies and document lengths — is a function of
      the per-(id, gram) count table, where a gram is either a token or a
      space-joined bigram. Whitespace tokens can never contain a space, so
      the two key spaces are disjoint and need no tag: ``contains(' ')``
      recovers the kind. One explode produces both streams (each zipped
      (token, next-token) row emits the token and, when next exists, the
      bigram), one hash aggregation collapses instances to distinct grams
      map-side, and one id-keyed aggregation derives all per-doc signals.
    - BM25's (N, avgdl, df) global row aggregates off the per-doc frame and
      broadcasts, as in the pivoted fast path.

    Value-equality notes: every count is integer-exact against the unfused
    composition; ratio/score expressions reuse the identical operand shapes
    (`_ratio_cols`, the pivoted BM25 scoring sum), so the only divergence
    class is partition-order float reassociation in ``avg(dl)`` — the same
    last-ulp class the unfused plan itself exhibits across partitionings,
    absorbed by the 6-dp rounding of the consumers. Docs with a NULL id are
    dropped up front (the unfused composition's inner joins on id drop them
    too); duplicate ids would fan out k-fold here vs k^2-fold through the
    three-way join, matching only for unique ids (the documents-table
    contract the dedup operators already rely on).

    Returns one row per non-null-id input row:
    ``(id, n_chars, n_tokens, avg_token_len, punct_ratio, space_ratio,
    score_<lang>..., lang_guess, fingerprint, bm25, type_token_ratio,
    top_token_frac, dup_bigram_frac, drop_reasons array, keep)``.
    """
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one non-blank term")
    if len(terms) > 32:
        raise ValueError(
            "profile_quality_bm25 fuses the pivoted (<=32-term) BM25 path; "
            "compose bm25_scores separately for larger vocabularies"
        )
    did = F.col(id_col)
    text = F.col(text_col)
    # spread the (filtered) corpus scan once; the projection leg and the
    # gram leg both read it, sharing one parquet read via AQE stage reuse
    # (see utils.spread_scan — measured at the 100x bench scale the two
    # row-group-starved scan legs were 260 s of the slot's 194 s wall)
    base = spread_scan(
        df.filter(did.isNotNull()).select(did, text)
    )

    # scan 1: per-row projection (identical expressions to text_profile)
    proj = base.select(
        did, *_raw_count_cols(text), _fingerprint_col(text)
    ).select(did, "n_chars", "n_tokens", *_ratio_cols(), "fingerprint")

    # scan 2: one explode yields the token AND bigram streams. The zipped
    # (token, next) pairs use the same trimmed-split construction as
    # repetition_stats, so the bigram multiset is identical; the token
    # multiset equals every leg's explode+filter form (empties can only
    # arise from all-whitespace docs and are length-filtered).
    trimmed = F.regexp_replace(F.lower(text), r"^\s+|\s+$", "")
    ta = F.split(trimmed, r"\s+")
    pairs = (
        base.select(did, ta.alias("_ta"))
        .select(
            did,
            F.explode(
                F.arrays_zip(
                    F.col("_ta").alias("_a"),
                    F.slice(
                        "_ta", 2, F.greatest(F.size("_ta") - 1, F.lit(0))
                    ).alias("_b"),
                )
            ).alias("_z"),
        )
        .select(did, F.col("_z._a").alias("_a"), F.col("_z._b").alias("_b"))
    )
    grams = pairs.select(
        did,
        F.explode(
            F.array(
                F.col("_a"),
                F.when(
                    F.col("_b").isNotNull(), F.concat_ws(" ", "_a", "_b")
                ),
            )
        ).alias("_g"),
    ).filter(F.length("_g") > 0)
    gcounts = grams.groupBy(did, "_g").agg(F.count(F.lit(1)).alias("_c"))

    istok = ~F.col("_g").contains(" ")
    per_doc = gcounts.groupBy(did).agg(
        F.sum(F.when(istok, F.col("_c"))).alias("_n"),
        F.sum(F.when(istok, F.lit(1))).alias("_types"),
        F.max(F.when(istok, F.col("_c"))).alias("_top"),
        F.sum(F.when(~istok, F.col("_c"))).alias("_nbg"),
        F.sum(F.when(~istok, F.lit(1))).alias("_dbg"),
        *[
            F.sum(
                F.when(istok & (F.col("_g") == F.lit(t)), F.col("_c"))
            ).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
        *[
            F.sum(F.when(F.col("_g").isin(*words), F.col("_c"))).alias(
                f"_s_{lang}"
            )
            for lang, words in LANG_MARKERS.items()
        ],
    )
    # every per_doc row has >=1 token (a bigram implies 2 tokens), so the
    # tf coalesce reproduces the pivoted path's count_if zeros exactly
    per_doc = per_doc.select(
        did,
        "_n",
        "_types",
        "_top",
        "_nbg",
        "_dbg",
        *[
            F.coalesce(F.col(f"_tf{i}"), F.lit(0).cast("long")).alias(f"_tf{i}")
            for i in range(len(terms))
        ],
        *[F.col(f"_s_{lang}") for lang in LANG_MARKERS],
    )
    gstats = per_doc.agg(
        F.count(F.lit(1)).alias("_ndocs"),
        F.avg("_n").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    score = F.lit(0.0)
    for i in range(len(terms)):
        idf_i = F.log(
            F.lit(1.0)
            + (F.col("_ndocs") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        tfn_i = (F.col(f"_tf{i}") * (k1 + 1)) / (
            F.col(f"_tf{i}")
            + k1 * (1 - b + b * F.col("_n") / F.col("_avgdl"))
        )
        score = score + F.when(
            F.col(f"_tf{i}") > 0, idf_i * tfn_i
        ).otherwise(F.lit(0.0))

    lvl1 = (
        proj.join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(gstats))
        .select(
            did,
            "n_chars",
            "n_tokens",
            "avg_token_len",
            "punct_ratio",
            "space_ratio",
            *_coalesced_score_cols(),
            "fingerprint",
            score.alias("_bm25"),
            F.round(
                F.when(
                    F.col("_n") > 0, F.col("_types") / F.col("_n")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("type_token_ratio"),
            F.round(
                F.when(
                    F.col("_n") > 0, F.col("_top") / F.col("_n")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_token_frac"),
            F.round(
                F.when(
                    F.col("_nbg") > 0,
                    (F.col("_nbg") - F.col("_dbg")) / F.col("_nbg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_bigram_frac"),
        )
    )
    rules = [
        ("too_few_tokens", F.col("n_tokens") < min_tokens),
        ("too_many_tokens", F.col("n_tokens") > max_tokens),
        ("punct_heavy", F.col("punct_ratio") > max_punct_ratio),
        ("tokens_too_short", F.col("avg_token_len") < min_avg_token_len),
        ("tokens_too_long", F.col("avg_token_len") > max_avg_token_len),
        ("repetitive_vocab", F.col("type_token_ratio") < min_type_token_ratio),
        ("repetitive_bigrams", F.col("dup_bigram_frac") > max_dup_bigram_frac),
    ]
    reasons = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return lvl1.select(
        did,
        "n_chars",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "space_ratio",
        *[f"score_{lang}" for lang in LANG_MARKERS],
        _guess_col(),
        "fingerprint",
        F.col("_bm25").alias("bm25"),
        "type_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
        reasons.alias("drop_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )
