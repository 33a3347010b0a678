"""Scale-feasible STRICT verification for the queries whose DuckDB oracles
are quadratic-by-design and therefore DNF above ~sf1 (all-pairs cosine over
2M vectors, all-pairs n-gram Jaccard over 500k docs, exact reachability).

For those, oracle-vs-oracle at sf10 is impossible on ANY engine — the
ground truth itself is quadratic. What IS checkable at scale, exactly and
deterministically:

- ``embedding_near_dups``: sampled-query exact recheck. Load the full
  embedding matrix into numpy (2M x 64 = 1 GB), brute-force the exact
  top-3-over-0.35 answer for a seeded sample of query ids (256 x 2M gram =
  seconds in BLAS) replicating the engine's exact tie/rounding semantics
  (HALF_UP round-6, neighbor-id tie-break, self-pair excluded), and require
  the engine's rows for those queries to match EXACTLY — including queries
  that must be absent because no neighbor clears 0.35.

- ``dedup_minhash_verified``: sampled-doc exact recall AND precision. For a
  seeded sample of doc ids, compute the exact n-gram Jaccard of each
  sampled doc against the ENTIRE corpus in DuckDB (sampled shingles join
  full shingles — linear in corpus, not quadratic) and require set equality
  with the engine's pairs touching the sample: every exact pair >= 0.3 is
  present (LSH recall), nothing extra is present (verifier precision), and
  jaccard values match to the engine's round-6.

- ``dedup_clusters``: full-graph invariants + sampled connectivity. The
  label frame is a valid connected-components answer iff (a) no edge
  crosses two labels (labels constant on components — checked with one
  join over the engine's OWN edge set), (b) every cluster's label equals
  the min member id and cluster_size equals the group count (one agg),
  (c) every label is itself a member of its cluster, and (d) label groups
  are actually connected (catches erroneous merges — BFS over the pulled
  edge lists of a seeded sample of clusters; cluster edge lists are tiny).
  (a)-(c) run distributed over the full graph; only (d) samples.

Usage: python tools/scale_verify.py <sf_dir> <query> [sample] [seed]
Queries: embedding_near_dups dedup_minhash_verified dedup_clusters all
Exits non-zero on any mismatch. Deterministic for fixed (sample, seed).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _spark():
    from mlforecast_spark.utils import get_spark

    spark = get_spark("scale-verify", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _round6(x: np.ndarray) -> np.ndarray:
    # HALF_UP to 6 decimals — matches Spark F.round / DuckDB ROUND;
    # numpy's np.round is banker's and diverges on exact .5 ties.
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def verify_embedding_near_dups(sf_dir: str, sample: int, seed: int) -> list[str]:
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    errs: list[str] = []
    spark = _spark()
    t0 = time.time()
    out = (
        entry.queries()["embedding_near_dups"](spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    t_spark = time.time() - t0
    print(f"spark rows={len(out)} in {t_spark:.1f}s")

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)[order]).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    rng = np.random.RandomState(seed)
    qsel = rng.choice(len(ids), size=min(sample, len(ids)), replace=False)
    qids = ids[qsel]

    # exact reference for the sampled queries, engine semantics replicated
    cos = _round6((M[qsel] @ M.T) / np.outer(norms[qsel], norms))
    self_mask = qids[:, None] == ids[None, :]
    ranked = np.where(self_mask, -np.inf, cos)
    idx = np.argsort(-ranked, axis=1, kind="stable")[:, :3]  # ids pre-sorted asc
    want = {}
    for r, qid in enumerate(qids):
        rows = [
            (int(ids[c]), float(ranked[r, c]))
            for c in idx[r]
            if ranked[r, c] >= 0.35
        ]
        if rows:
            want[int(qid)] = rows
    got_sub = out[out["query_id"].isin(set(int(q) for q in qids))]
    got = {
        int(q): [
            (int(n), float(c))
            for n, c in zip(g["neighbor_id"], g["cosine"])
        ]
        for q, g in got_sub.groupby("query_id")
    }
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    if missing:
        errs.append(f"queries missing from engine output: {sorted(missing)[:5]} (+{len(missing)})")
    if extra:
        errs.append(f"queries present that must be empty: {sorted(extra)[:5]} (+{len(extra)})")
    for q in sorted(set(want) & set(got)):
        if want[q] != got[q]:
            errs.append(f"query {q}: exact {want[q]} != engine {got[q]}")
            if len(errs) > 10:
                break
    print(
        f"sampled-query exact recheck: {len(qids)} queries, "
        f"{sum(len(v) for v in want.values())} expected rows, "
        f"{len(errs)} mismatches"
    )
    return errs


def verify_dedup_minhash_verified(sf_dir: str, sample: int, seed: int) -> list[str]:
    import duckdb

    import __spark_entry__ as entry

    errs: list[str] = []
    spark = _spark()
    t0 = time.time()
    out = entry.queries()["dedup_minhash_verified"](spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    print(f"spark rows={len(out)} in {t_spark:.1f}s")

    con = duckdb.connect()
    con.execute("SET memory_limit = '40GB'")
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    all_ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    rng = np.random.RandomState(seed)
    sel = rng.choice(len(all_ids), size=min(sample, len(all_ids)), replace=False)
    sample_ids = ",".join(str(int(x)) for x in all_ids[sel])
    # exact Jaccard of each SAMPLED doc against the whole corpus: the
    # sampled-side shingle set is tiny, so the join is linear in corpus
    # shingles — feasible at any SF, unlike the all-pairs oracle.
    t0 = time.time()
    exact = con.execute(
        f"""
        WITH toks AS (SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\\s+') AS t
                      FROM read_parquet('{sf_dir}/documents.parquet')),
        sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
               FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
               WHERE len(t) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        ssh AS (SELECT * FROM sh WHERE doc_id IN ({sample_ids})),
        inter AS (SELECT s.doc_id AS sid, o.doc_id AS oid, COUNT(*) AS n_inter
                  FROM ssh s JOIN sh o ON s.shingle = o.shingle AND s.doc_id <> o.doc_id
                  GROUP BY 1, 2)
        SELECT DISTINCT LEAST(sid, oid) AS id_a, GREATEST(sid, oid) AS id_b,
               ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter JOIN sizes sa ON sid = sa.doc_id JOIN sizes sb ON oid = sb.doc_id
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.3
        """
    ).df()
    print(f"duckdb sampled exact: {len(exact)} pairs in {time.time() - t0:.1f}s ({n_docs} docs)")
    sset = set(int(x) for x in all_ids[sel])
    eng = out[out["id_a"].isin(sset) | out["id_b"].isin(sset)]
    want = {(int(a), int(b)): float(j) for a, b, j in zip(exact.id_a, exact.id_b, exact.jaccard)}
    got = {(int(a), int(b)): float(j) for a, b, j in zip(eng.id_a, eng.id_b, eng.jaccard)}
    miss = set(want) - set(got)
    extra = set(got) - set(want)
    if miss:
        errs.append(f"RECALL: {len(miss)} exact pairs >=0.3 missing, e.g. {sorted(miss)[:5]}")
    if extra:
        errs.append(f"PRECISION: {len(extra)} engine pairs not exact >=0.3, e.g. {sorted(extra)[:5]}")
    vals = [(p, want[p], got[p]) for p in set(want) & set(got) if want[p] != got[p]]
    if vals:
        errs.append(f"VALUES: {len(vals)} jaccard mismatches, e.g. {vals[:5]}")
    print(
        f"sampled-doc exact recall/precision: {len(sel)} docs, "
        f"{len(want)} exact pairs, {len(got)} engine pairs touching sample, "
        f"{len(errs)} failures"
    )
    return errs


def verify_dedup_ngram_jaccard(sf_dir: str, sample: int, seed: int) -> list[str]:
    """Sampled-doc exact check for the (lang, source)-blocked exact-Jaccard
    slot (threshold 0.2): same technique as dedup_minhash_verified's
    verifier, with the block equality folded into the shingle join. The
    slot's full all-pairs DuckDB oracle is quadratic-per-block and DNF-class
    at sf10 on both engines; this bounds the exact reference by the sample."""
    import duckdb

    import __spark_entry__ as entry

    errs: list[str] = []
    spark = _spark()
    t0 = time.time()
    out = entry.queries()["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    print(f"spark rows={len(out)} in {time.time() - t0:.1f}s")
    con = duckdb.connect()
    con.execute("SET memory_limit = '40GB'")
    all_ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    rng = np.random.RandomState(seed)
    sel = rng.choice(len(all_ids), size=min(sample, len(all_ids)), replace=False)
    sample_ids = ",".join(str(int(x)) for x in all_ids[sel])
    t0 = time.time()
    exact = con.execute(
        f"""
        WITH toks AS (SELECT doc_id, lang, source,
                      string_split_regex(TRIM(LOWER(text)), '\\s+') AS t
                      FROM read_parquet('{sf_dir}/documents.parquet')),
        sh AS (SELECT DISTINCT doc_id, lang, source,
                      t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
               FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
               WHERE len(t) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        ssh AS (SELECT * FROM sh WHERE doc_id IN ({sample_ids})),
        inter AS (SELECT s.doc_id AS sid, o.doc_id AS oid, COUNT(*) AS n_inter
                  FROM ssh s JOIN sh o ON s.shingle = o.shingle
                   AND s.lang = o.lang AND s.source = o.source
                   AND s.doc_id <> o.doc_id
                  GROUP BY 1, 2)
        SELECT DISTINCT LEAST(sid, oid) AS id_a, GREATEST(sid, oid) AS id_b,
               ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter JOIN sizes sa ON sid = sa.doc_id JOIN sizes sb ON oid = sb.doc_id
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
        """
    ).df()
    print(f"duckdb sampled exact: {len(exact)} pairs in {time.time() - t0:.1f}s")
    sset = set(int(x) for x in all_ids[sel])
    eng = out[out["id_a"].isin(sset) | out["id_b"].isin(sset)]
    want = {(int(a), int(b)): float(j) for a, b, j in zip(exact.id_a, exact.id_b, exact.jaccard)}
    got = {(int(a), int(b)): float(j) for a, b, j in zip(eng.id_a, eng.id_b, eng.jaccard)}
    miss = set(want) - set(got)
    extra = set(got) - set(want)
    if miss:
        errs.append(f"MISSING: {len(miss)} exact pairs >=0.2 absent, e.g. {sorted(miss)[:5]}")
    if extra:
        errs.append(f"EXTRA: {len(extra)} engine pairs not exact >=0.2, e.g. {sorted(extra)[:5]}")
    vals = [(p, want[p], got[p]) for p in set(want) & set(got) if want[p] != got[p]]
    if vals:
        errs.append(f"VALUES: {len(vals)} jaccard mismatches, e.g. {vals[:5]}")
    print(
        f"sampled-doc exact: {len(sel)} docs, {len(want)} exact vs {len(got)} engine pairs, "
        f"{len(errs)} failures"
    )
    return errs


def verify_dedup_clusters(sf_dir: str, sample: int, seed: int) -> list[str]:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    errs: list[str] = []
    spark = _spark()
    qs = entry.queries()
    t0 = time.time()
    labels = qs["dedup_clusters"](spark, sf_dir).cache()
    n_nodes = labels.count()
    print(f"spark labels={n_nodes} in {time.time() - t0:.1f}s")
    edges = (
        qs["embedding_near_dups"](spark, sf_dir)
        .select(F.col("query_id").alias("u"), F.col("neighbor_id").alias("v"))
        .cache()
    )
    lu = labels.select(F.col("node_id").alias("u"), F.col("cluster_id").alias("cu"))
    lv = labels.select(F.col("node_id").alias("v"), F.col("cluster_id").alias("cv"))
    # (a) labels constant on components: no edge may cross two labels
    crossing = edges.join(lu, "u").join(lv, "v").filter(F.col("cu") != F.col("cv")).count()
    if crossing:
        errs.append(f"FIXPOINT: {crossing} edges cross cluster labels")
    # (b) label = min member id, cluster_size = group count
    grp = labels.groupBy("cluster_id").agg(
        F.min("node_id").alias("min_id"),
        F.count("*").alias("n"),
        F.max("cluster_size").alias("sz_max"),
        F.min("cluster_size").alias("sz_min"),
    )
    bad_min = grp.filter(F.col("min_id") != F.col("cluster_id")).count()
    bad_sz = grp.filter((F.col("sz_max") != F.col("n")) | (F.col("sz_min") != F.col("n"))).count()
    if bad_min:
        errs.append(f"CANONICAL: {bad_min} clusters whose label != min member id")
    if bad_sz:
        errs.append(f"SIZE: {bad_sz} clusters with inconsistent cluster_size")
    # (c) the label id is a member of its own cluster
    member = grp.join(
        labels.select(F.col("node_id").alias("cluster_id")).distinct(), "cluster_id", "left_semi"
    ).count()
    if member != grp.count():
        errs.append("MEMBERSHIP: some cluster label is not a member node")
    # (d) sampled connectivity — catches erroneous merges (a)-(c) cannot
    multi = [r.cluster_id for r in grp.filter(F.col("n") > 1).select("cluster_id").collect()]
    rng = np.random.RandomState(seed)
    pick = rng.choice(len(multi), size=min(sample, len(multi)), replace=False) if multi else []
    chosen = set(int(multi[i]) for i in pick)
    if chosen:
        mem = labels.filter(F.col("cluster_id").isin(chosen)).select("node_id", "cluster_id").toPandas()
        sub = (
            edges.join(lu, "u")
            .filter(F.col("cu").isin(chosen))
            .select("u", "v", "cu")
            .toPandas()
        )
        from collections import defaultdict

        adj = defaultdict(set)
        for u, v in zip(sub.u, sub.v):
            adj[int(u)].add(int(v))
            adj[int(v)].add(int(u))
        for cid, g in mem.groupby("cluster_id"):
            nodes = set(int(x) for x in g.node_id)
            seen = {int(cid)}
            stack = [int(cid)]
            while stack:
                n = stack.pop()
                for m in adj[n]:
                    if m in nodes and m not in seen:
                        seen.add(m)
                        stack.append(m)
            if seen != nodes:
                errs.append(f"CONNECTIVITY: cluster {cid} not connected ({len(seen)}/{len(nodes)} reachable)")
                break
    print(
        f"invariants: crossing={crossing} bad_min={bad_min} bad_sz={bad_sz}; "
        f"sampled connectivity on {len(chosen)} multi-node clusters; {len(errs)} failures"
    )
    labels.unpersist()
    edges.unpersist()
    return errs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    sample = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    fns = {
        "embedding_near_dups": verify_embedding_near_dups,
        "dedup_minhash_verified": verify_dedup_minhash_verified,
        "dedup_ngram_jaccard": verify_dedup_ngram_jaccard,
        "dedup_clusters": verify_dedup_clusters,
    }
    names = list(fns) if which == "all" else [which]
    failed = False
    for name in names:
        print(f"=== {name} @ {sf_dir} (sample={sample}, seed={seed})")
        errs = fns[name](sf_dir, sample, seed)
        for e in errs:
            print(f"  FAIL {e}")
        print(f"{name}: {'FAIL' if errs else 'OK'}")
        failed = failed or bool(errs)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
