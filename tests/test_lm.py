"""Distributed Stupid Backoff n-gram LM vs an independent pure-Python
reference implementation on the same tokenization."""

import math

import pytest


def _py_stupid_backoff(train_texts, score_texts, order, alpha):
    """Independent reference: dict-based n-gram counts + per-token backoff
    scoring with the same contract as operators/lm.py (longest available
    context per position; alpha only for unseen full-length grams; OOV
    floor 0.5/N)."""
    def tok(t):
        return [w for w in t.lower().split() if w]

    counts = [dict() for _ in range(order + 1)]  # counts[k]
    total = 0
    for t in train_texts:
        ws = tok(t)
        total += len(ws)
        for k in range(1, order + 1):
            for i in range(len(ws) - k + 1):
                g = tuple(ws[i : i + k])
                counts[k][g] = counts[k].get(g, 0) + 1

    out = []
    for t in score_texts:
        ws = tok(t)
        lps = []
        for i in range(len(ws)):  # 0-based; position i+1 in 1-based terms
            def level_score(k):
                if k == 1:
                    c = counts[1].get((ws[i],))
                    return c / total if c else None
                g = tuple(ws[i - k + 1 : i + 1])
                ctx = tuple(ws[i - k + 1 : i])
                cg, cc = counts[k].get(g), counts[k - 1].get(ctx)
                if cg and cc:
                    return cg / cc
                lower = level_score(k - 1)
                return None if lower is None else alpha * lower

            kmax = min(order, i + 1)
            s = level_score(kmax)
            if s is None:
                s = 0.5 / total
            lps.append(math.log10(s))
        out.append((len(lps), sum(lps) / len(lps)))
    return out


def test_ngram_lm_matches_reference(spark):
    from mlforecast_spark.operators.lm import score_docs, train_ngram_lm

    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat ran over the hill",
        "a dog and a cat played on the hill",
    ]
    score = [
        "the cat sat on the hill",       # mostly seen grams
        "the dog ran over the mat",      # mixed backoffs
        "zebra quantum flux",            # all OOV
        "the",                           # single token
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    lm = train_ngram_lm(tdf, order=3)
    assert lm.total == sum(len(t.split()) for t in train)
    got = (
        score_docs(sdf, lm, alpha=0.4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _py_stupid_backoff(train, score, order=3, alpha=0.4)
    for i, (n, lp) in enumerate(want):
        assert got.loc[i, "n_scored_tokens"] == n
        assert abs(got.loc[i, "avg_logprob"] - lp) < 1e-5, (
            i, got.loc[i, "avg_logprob"], lp,
        )
    # natural text scores above word salad
    assert got.loc[0, "avg_logprob"] > got.loc[2, "avg_logprob"]


def test_ngram_lm_order2_and_shuffle_join(spark):
    from mlforecast_spark.operators.lm import score_docs, train_ngram_lm

    train = ["alpha beta gamma delta", "alpha beta delta gamma"]
    score = ["alpha beta gamma", "gamma alpha"]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    lm = train_ngram_lm(tdf, order=2)
    a = score_docs(sdf, lm).toPandas().set_index("doc_id").sort_index()
    b = (
        score_docs(sdf, lm, broadcast_counts=False)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert a.equals(b)  # broadcast and shuffle plans agree exactly
    want = _py_stupid_backoff(train, score, order=2, alpha=0.4)
    for i, (n, lp) in enumerate(want):
        assert abs(a.loc[i, "avg_logprob"] - lp) < 1e-5


def test_ngram_lm_save_load_and_pruning(spark, tmp_path):
    from mlforecast_spark.operators.lm import NGramLM, score_docs, train_ngram_lm

    train = ["x y z " * 10 + "rare bigram here", "x y z x y z"]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    lm = train_ngram_lm(tdf, order=2, min_count=3)
    # pruned model: rare bigrams gone, frequent ones kept
    assert lm.counts[2].filter("cnt < 3").count() == 0
    path = str(tmp_path / "lm")
    lm.save(path)
    lm2 = NGramLM.load(spark, path)
    assert lm2.order == 2 and lm2.total == lm.total
    sdf = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    a = score_docs(sdf, lm).toPandas()
    b = score_docs(sdf, lm2).toPandas()
    assert a.equals(b)

    with pytest.raises(ValueError, match="order"):
        train_ngram_lm(tdf, order=0)


def test_importance_resample(spark):
    """DSIR selection: with a target LM trained on domain A and a base LM on
    the mixed corpus, top-k selection strongly prefers domain-A docs; the
    choice is deterministic; invalid params raise."""
    import numpy as np
    from mlforecast_spark.operators.lm import importance_resample, train_ngram_lm

    rng = np.random.default_rng(29)
    math_words = ["theorem", "proof", "lemma", "integral", "matrix",
                  "vector", "algebra", "converge", "bound", "norm"]
    web_words = ["click", "subscribe", "offer", "deal", "shop",
                 "login", "cookie", "banner", "advert", "sale"]

    def doc(words, n=25):
        return " ".join(rng.choice(words, size=n))

    # target corpus: pure math; raw corpus: half math, half web
    target = [(i, doc(math_words)) for i in range(30)]
    raw = [(100 + i, doc(math_words)) for i in range(25)] + [
        (200 + i, doc(web_words)) for i in range(25)
    ]
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    target_lm = train_ngram_lm(tdf, order=2)
    base_lm = train_ngram_lm(rdf, order=2)
    sel = importance_resample(rdf, target_lm, base_lm, k=20).toPandas()
    assert len(sel) == 20
    math_frac = (sel.doc_id < 200).mean()
    assert math_frac >= 0.9, math_frac
    # deterministic
    sel2 = importance_resample(rdf, target_lm, base_lm, k=20).toPandas()
    assert set(sel.doc_id) == set(sel2.doc_id)
    # a different salt draws different gumbels (weights unchanged)
    sel3 = importance_resample(rdf, target_lm, base_lm, k=20, salt="x").toPandas()
    assert set(sel3.doc_id) != set() and len(sel3) == 20

    # the global top-k plans as TakeOrderedAndProject (no single-partition
    # full sort of the whole scored corpus)
    plan = (
        importance_resample(rdf, target_lm, base_lm, k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        importance_resample(rdf, target_lm, base_lm, k=0)
    with _pytest.raises(ValueError, match="temperature"):
        importance_resample(rdf, target_lm, base_lm, k=5, temperature=0)


def test_perplexity_buckets(spark):
    """Head/middle/tail split at exact quantiles of the LM score; head is
    the most natural text; per-group mode respects group cutoffs."""
    import numpy as np

    from mlforecast_spark.operators.lm import perplexity_buckets, train_ngram_lm

    ref_rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    lm = train_ngram_lm(ref, order=2)

    rows = (
        [(i, "the quick brown fox jumps", "en") for i in range(6)]      # natural
        + [(10 + i, "fox the dog quick lazy", "en") for i in range(6)]  # shuffled
        + [(20 + i, "zz yy xx ww vv uu", "en") for i in range(6)]       # OOV
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df, lm).toPandas().set_index("doc_id")
    assert (out.loc[0:5, "ppl_bucket"] == "head").all()
    assert (out.loc[20:25, "ppl_bucket"] == "tail").all()
    # bucket masses follow the fractions (18 docs, thirds; quantile ties
    # fall into the better bucket)
    counts = out.ppl_bucket.value_counts()
    assert counts["head"] >= 6 and counts["tail"] <= 6

    # grouped mode: each lang gets its own cutoffs
    out2 = perplexity_buckets(df, lm, by="lang").toPandas()
    assert set(out2.columns) >= {"doc_id", "lang", "ppl_bucket"}
    assert (out2.groupby("lang").ppl_bucket.nunique() >= 2).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="fractions"):
        perplexity_buckets(df, lm, fractions=(0.9, 0.2))
