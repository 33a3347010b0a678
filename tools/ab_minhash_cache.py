"""A/B the minhash signatures cache under the DRIVER BENCH's single-shot
protocol: warm pass at the tiny SF, warm pass at the bench SF, ONE timed
shot — per mode, interleaved in one session.

Round-9 dropped the exploded-bands cache (warm-rep-min A/B said
equal-or-faster uncached) and the driver bench then read
`dedup_minhash_lsh` +19% — noise-consistent (the isolated warm-rep minimum
was unchanged at 0.99–1.28 s) but untested at the bench's own protocol,
which times ONE shot after two warm passes rather than a min over reps.
This tool reproduces that exact protocol for the remaining cache decision
(the `signatures.cache()` feeding the self-join's four uses): mode
`cache_on` is the shipped default, `cache_off` passes `cache=False` so the
shingle+minhash pipeline recomputes per use.

Each rep clears the Spark cache first so `cache_on` reps don't inherit a
previous rep's cached signatures (the driver's process is fresh per round).

Usage:
    python tools/ab_minhash_cache.py [sf_dir] [reps]

Prints one JSON line:
    {"sf_dir": ..., "reps": N, "query": "dedup_minhash_lsh",
     "cache_on": [s, ...], "cache_off": [s, ...],
     "cache_on_min": s, "cache_off_min": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> int:
    cols = [F.col(f"`{c}`") for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mlforecast_spark.utils import get_spark

    spark = get_spark("ab-minhash-cache", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from mlforecast_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        shingle_df,
    )

    def query(sf: str, cache: bool):
        docs = entry._docs(spark, sf)
        sig = minhash_signatures(shingle_df(docs, n=3, distinct=False))
        return minhash_lsh_candidates(
            sig, max_bucket_size=1000, cache=cache
        ).filter(F.col("est_jaccard") >= 0.5)

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    def one_shot(cache: bool) -> float:
        # the driver-bench protocol: tiny-SF warm, bench-SF warm, ONE timed
        spark.catalog.clearCache()
        if os.path.isdir(warm_dir):
            _force(query(warm_dir, cache))
        _force(query(sf_dir, cache))
        t0 = time.perf_counter()
        _force(query(sf_dir, cache))
        return time.perf_counter() - t0

    timings: dict[str, list[float]] = {"cache_on": [], "cache_off": []}
    for _ in range(reps):
        for mode, cache in (("cache_on", True), ("cache_off", False)):
            timings[mode].append(round(one_shot(cache), 3))

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "query": "dedup_minhash_lsh",
        **timings,
        "cache_on_min": min(timings["cache_on"]),
        "cache_off_min": min(timings["cache_off"]),
        "cache_on_mean": round(sum(timings["cache_on"]) / reps, 3),
        "cache_off_mean": round(sum(timings["cache_off"]) / reps, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
