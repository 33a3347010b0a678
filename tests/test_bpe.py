"""Trainable BPE tokenizer: learner parity vs a naive reference, encode
round-trips, distributed apply vs driver-side encode, determinism, and the
bounded-histogram training path.

Reference semantics: Sennrich et al. 2016 (arXiv:1508.07909) word-level BPE
with an end-of-word marker; the naive reference below recounts every pair
from scratch each round, so any incremental-bookkeeping bug in the shipped
learner shows up as a merge-sequence divergence."""

import pytest
from pyspark.sql import functions as F

from mlforecast_spark.operators.bpe import (
    END_OF_WORD,
    BPETokenizer,
    encode_word,
    learn_bpe_merges,
    train_bpe,
    word_histogram,
)


def _naive_bpe(word_counts, num_merges):
    words = {}
    for w, c in word_counts:
        syms = tuple(w[:-1]) + (w[-1] + END_OF_WORD,)
        words[syms] = words.get(syms, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] <= 0:
            break
        merges.append(best)
        new_words = {}
        for syms, c in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return merges


def test_learner_matches_naive_reference():
    corpus = [
        ("low", 5), ("lower", 2), ("lowest", 6), ("newer", 3),
        ("new", 4), ("wider", 1), ("widest", 2), ("newest", 5),
    ]
    for k in (1, 3, 8, 40):
        got = learn_bpe_merges(corpus, k)
        want = _naive_bpe(corpus, k)
        assert got == want, (k, got, want)


def test_learner_first_merge_hand_checked():
    # "ab" x3 + "abc" x2: pair (a, b</w>) appears 3 times (in "ab"),
    # (a, b) twice, (b, c</w>) twice -> first merge is (a, b</w>)
    merges = learn_bpe_merges([("ab", 3), ("abc", 2)], 1)
    assert merges == [("a", "b" + END_OF_WORD)]


def test_learner_tie_breaks_lexicographically():
    # "xy" and "ab" both appear twice -> counts tie at 2 for (a, b</w>)
    # and (x, y</w>); lexicographically smaller pair wins
    merges = learn_bpe_merges([("xy", 2), ("ab", 2)], 1)
    assert merges == [("a", "b" + END_OF_WORD)]


def test_encode_round_trip_lossless():
    corpus = [("banana", 4), ("bandana", 2), ("cabana", 3)]
    tok = BPETokenizer(learn_bpe_merges(corpus, 10))
    for w in ("banana", "bandana", "cabana", "ban", "zebra"):
        toks = encode_word(w, tok.ranks)
        assert "".join(toks) == w + END_OF_WORD
    text = "banana cabana zebra"
    assert "".join(tok.encode(text)) == "banana" + END_OF_WORD + "cabana" + (
        END_OF_WORD
    ) + "zebra" + END_OF_WORD


def test_oov_characters_stay_single_chars():
    tok = BPETokenizer(learn_bpe_merges([("aaa", 5)], 5))
    toks = encode_word("q7é", tok.ranks)
    assert toks == ["q", "7", "é" + END_OF_WORD]


def test_json_save_load_round_trip(tmp_path):
    tok = BPETokenizer(learn_bpe_merges([("hello", 3), ("help", 2)], 6))
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    loaded = BPETokenizer.load(p)
    assert loaded.merges == tok.merges
    assert loaded.encode("hello help melt") == tok.encode("hello help melt")


def test_train_bpe_distributed_and_apply(spark):
    rows = [
        (0, "the lowest tide the lower tide"),
        (1, "newer and newest tides"),
        (2, "the newest the lowest"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = train_bpe(df.filter(F.col("text").isNotNull()), num_merges=30)

    # distributed tokenize == driver-side encode, doc by doc
    out = tok.tokenize(df.filter(F.col("text").isNotNull())).toPandas()
    out = out.set_index("doc_id")
    for doc_id, text in rows[:3]:
        want = tok.encode(text)
        assert list(out.loc[doc_id, "tokens"]) == want
        assert out.loc[doc_id, "n_tokens"] == len(want)

    # count-only path agrees with the token path
    cnt = tok.token_counts(df.filter(F.col("text").isNotNull())).toPandas()
    cnt = cnt.set_index("doc_id")["n_tokens"]
    assert (cnt == out["n_tokens"]).all()

    # determinism: retraining on the same data gives the same merges
    tok2 = train_bpe(df.filter(F.col("text").isNotNull()), num_merges=30)
    assert tok2.merges == tok.merges


def test_word_histogram_cap_keeps_most_frequent(spark):
    rows = [(0, "a a a a b b b c c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = word_histogram(df, max_words=2).toPandas()
    assert hist["word"].tolist() == ["a", "b"]
    assert hist["n"].tolist() == [4, 3]


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR), reason="driver testdata absent"
)
def test_train_bpe_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tok = train_bpe(docs, num_merges=200, max_words=5000)
    assert len(tok.merges) > 50
    out = tok.token_counts(docs.limit(50)).toPandas()
    assert (out["n_tokens"] > 0).all()
    # BPE splits words and never joins across whitespace, so the learned
    # count is bounded below by the whitespace word count
    ws = docs.limit(50).select(
        F.col("doc_id"),
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).alias("nw"),
    ).toPandas().set_index("doc_id")["nw"]
    got = out.set_index("doc_id")["n_tokens"]
    assert (got >= ws.loc[got.index]).all()


@pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR), reason="driver testdata absent"
)
def test_word_histogram_matches_duckdb(spark, duck):
    """The corpus-scale step of train_bpe, pinned EXACTLY against an
    independent SQL engine: whitespace split -> unnest -> count -> top-K by
    (count desc, word asc)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = (
        word_histogram(docs, max_words=300)
        .toPandas()
        .sort_values(["n", "word"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = duck.execute(
        f"""
        SELECT word, COUNT(*) AS n
        FROM (
            SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
            FROM read_parquet('{SF_DIR}/documents.parquet')
        )
        WHERE word <> ''
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 300
        """
    ).df()
    assert got["word"].tolist() == want["word"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


@pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR), reason="driver testdata absent"
)
def test_bpe_counts_feed_sequence_packing(spark):
    """Tokenizer-aware packing: learned-BPE counts drive pack_sequences, and
    the packed slices account for every token exactly."""
    from mlforecast_spark.operators.bpe import train_bpe
    from mlforecast_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    tok = train_bpe(docs, num_merges=100, max_words=2000)
    counted = tok.token_counts(docs)
    packed = pack_sequences(counted, max_tokens=256, token_count_col="n_tokens")
    total_slices = packed.agg(F.sum("slice_tokens")).collect()[0][0]
    total_tokens = counted.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_slices == total_tokens


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=25),
)
def test_learner_matches_naive_reference_property(corpus, k):
    """Property: the incremental heap learner equals the recount-every-round
    reference on arbitrary small corpora and merge depths — any pair-count
    bookkeeping or tie-break drift shows up here."""
    assert learn_bpe_merges(corpus, k) == _naive_bpe(corpus, k)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=5),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=8,
    ),
    st.text(alphabet="abcdxyz ", max_size=30),
)
def test_encode_round_trip_property(corpus, text):
    """Property: encoding any text (including OOV characters) with any
    learned merge set is lossless up to the end-of-word markers."""
    tok = BPETokenizer(learn_bpe_merges(corpus, 12))
    joined = "".join(tok.encode(text))
    assert joined == "".join(w + END_OF_WORD for w in text.split())
