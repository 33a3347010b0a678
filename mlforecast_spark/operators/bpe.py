"""Trainable byte-pair-encoding tokenizer for training-data pipelines.

Classic word-level BPE (Sennrich et al. 2016, arXiv:1508.07909): learn the
``vocab_size`` most frequent symbol-pair merges over a word-frequency
histogram, then tokenize by replaying the merges per word. Complements the
vocabulary-free ``text.bpe_token_count`` lower bound with a REAL learned
vocabulary whose counts match what a downstream trainer will see.

Scale shape (100 TB): the only corpus-size-dependent step is the word
histogram — one tokenize → explode → groupBy(word) aggregation, capped at
``max_words`` distinct words via TakeOrdered (count desc, word asc — no
full sort). Merge learning runs on that bounded histogram on the driver
with incrementally-maintained pair counts (each merge touches only the
words that contain the pair, the standard subword-nmt bookkeeping), so
training cost is independent of corpus size beyond the one aggregation.
Encoding broadcasts the merge-rank dict (≤ vocab_size entries) and applies
it in one Arrow pass with a per-batch word cache — natural text repeats
words heavily, so the per-word merge replay runs once per DISTINCT word
per batch, not once per occurrence.
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# end-of-word marker: distinguishes "est</w>" (word-final, as in "lowest"
# is NOT — "est" ends it) from mid-word "est"; any string not produced by
# whitespace tokenization works
END_OF_WORD = "</w>"


def _word_symbols(word: str) -> tuple:
    return tuple(word[:-1]) + (word[-1] + END_OF_WORD,)


def learn_bpe_merges(
    word_counts: Iterable[tuple],
    num_merges: int,
) -> list:
    """Learn up to ``num_merges`` BPE merges from ``(word, count)`` pairs.

    Deterministic: the best pair is (max summed count, then lexicographically
    smallest pair). Pair counts are maintained incrementally — each merge
    re-segments only the words that contain the merged pair (tracked by a
    pair → word-ids index), and the argmax is a lazy-deletion heap keyed
    (-count, pair), so each round costs O(touched pairs · log), not a scan
    of every live pair.
    """
    import heapq

    words = []  # word_id -> [symbols...]
    counts = []  # word_id -> corpus count
    for w, c in word_counts:
        if not w:
            continue
        words.append(list(_word_symbols(w)))
        counts.append(int(c))

    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> set of word ids that have contained it
    touched: set = set()

    def add_word_pairs(wid: int, sign: int) -> None:
        syms = words[wid]
        c = counts[wid] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            touched.add(p)
            if sign > 0:
                pair_words.setdefault(p, set()).add(wid)

    for wid in range(len(words)):
        add_word_pairs(wid, 1)

    heap = [(-c, p) for p, c in pair_counts.items() if c > 0]
    heapq.heapify(heap)

    merges: list = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue  # fully merged away or retracted: stale entry
        if cur != -negc:
            heapq.heappush(heap, (-cur, best))  # stale count: requeue fresh
            continue
        merges.append(best)
        merged = best[0] + best[1]
        touched.clear()
        # pair_words may hold stale ids (word re-segmented past the pair by
        # a later merge); the retract+re-add below is a no-op for those
        for wid in pair_words.get(best, ()):
            syms = words[wid]
            if len(syms) < 2:
                continue
            add_word_pairs(wid, -1)
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = out
            add_word_pairs(wid, 1)
        # the merged pair no longer occurs anywhere
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        touched.discard(best)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Replay merges on one word, lowest rank first (GPT-2-style loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BPETokenizer:
    """A learned merge list plus its distributed apply.

    ``merges`` orders the learned pairs; ``vocab()`` is the implied token
    set (single characters seen at train time appear merged or not — OOV
    characters at encode time simply stay as single-character tokens, so
    encoding never fails on unseen input)."""

    def __init__(self, merges: list):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}

    # -- driver-side ----------------------------------------------------
    def encode(self, text: str) -> list:
        out = []
        for w in text.split():
            out.extend(encode_word(w, self.ranks))
        return out

    def vocab(self) -> list:
        toks = set()
        for a, b in self.merges:
            toks.update((a, b, a + b))
        return sorted(toks)

    def to_json(self) -> str:
        return json.dumps({"version": 1, "merges": [list(m) for m in self.merges]})

    @classmethod
    def from_json(cls, s: str) -> "BPETokenizer":
        d = json.loads(s)
        return cls([tuple(m) for m in d["merges"]])

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            return cls.from_json(f.read())

    # -- distributed apply ----------------------------------------------
    def _encode_udf(self, count_only: bool):
        ranks = self.ranks  # closure-broadcast: ≤ vocab_size small tuples

        def fn(col):
            import pandas as pd

            cache: dict = {}

            def enc(text):
                out = []
                for w in text.split():
                    toks = cache.get(w)
                    if toks is None:
                        toks = encode_word(w, ranks)
                        cache[w] = toks
                    out.extend(toks)
                return out

            if count_only:
                return pd.Series(
                    [len(enc(t)) if t is not None else None for t in col]
                )
            return pd.Series([enc(t) if t is not None else None for t in col])

        return F.pandas_udf(fn, "long" if count_only else "array<string>")

    def tokens_col(self, text: Column) -> Column:
        """Tokens as ``array<string>`` — one Arrow pass, word-cached."""
        return self._encode_udf(count_only=False)(text)

    def token_count_col(self, text: Column) -> Column:
        return self._encode_udf(count_only=True)(text)

    def tokenize(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        toks = self.tokens_col(F.col(text_col))
        # size(NULL) is -1 under default sizeOfNull semantics; null text
        # must count as NULL (matching token_counts), not -1. nullif keeps
        # the UDF referenced twice (tokens + size), not three times — a
        # real token list is never size -1
        n = F.nullif(F.size(toks).cast("long"), F.lit(-1))
        return df.select(
            F.col(id_col),
            toks.alias("tokens"),
            n.alias("n_tokens"),
        )

    def token_counts(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        return df.select(
            F.col(id_col),
            self.token_count_col(F.col(text_col)).alias("n_tokens"),
        )


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 65536,
) -> DataFrame:
    """The corpus-size-dependent step: distinct-word counts, capped at the
    ``max_words`` most frequent (TakeOrdered on count desc, word asc — the
    cap is what bounds driver memory and merge-learning cost)."""
    words = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    hist = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return hist.orderBy(F.col("n").desc(), F.col("word")).limit(int(max_words))


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1024,
    max_words: int = 65536,
) -> BPETokenizer:
    """One distributed aggregation + driver-side merge learning.

    The histogram cap makes training cost corpus-size-independent: at any
    corpus scale the driver sees at most ``max_words`` (word, count) rows.
    Truncation biases only the rarest words' counts, which the merge
    objective (frequency-greedy) is least sensitive to."""
    rows = word_histogram(df, text_col=text_col, max_words=max_words).collect()
    merges = learn_bpe_merges(((r["word"], r["n"]) for r in rows), num_merges)
    return BPETokenizer(merges)
