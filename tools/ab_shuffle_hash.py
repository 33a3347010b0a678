"""A/B the SHUFFLE_HASH hints in operators/dedup.py (hint-on vs hint-off).

Round-6 VERDICT item: the driver bench showed dedup_minhash_lsh +48% /
dedup_simhash +54% at sf0.1 vs round 5 while the DuckDB oracle was flat,
and the round-6 SHUFFLE_HASH hints had only been A/B'd at sf10 (where they
win 21.8 -> 11.3 s). Round 7 replaced the static hint with AQE's runtime
SMJ->SHJ conversion; "hint_on" now means MLFS_FORCE_SHUFFLE_HASH=1 (the old
static hint) and "hint_off" the AQE default. Interleaved warm reps per mode:
interleaved warm reps per mode at one SF, per-query MIN (the noise-robust
statistic on this sandbox — identical runs swing 2-4x per query).

Usage:
    python tools/ab_shuffle_hash.py [sf_dir] [reps]

Prints one JSON line:
    {"sf_dir": ..., "reps": N,
     "queries": {"dedup_minhash_lsh": {"hint_on": s, "hint_off": s}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUERIES = ["dedup_minhash_lsh", "dedup_simhash"]


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

    spark = get_spark("ab-shuffle-hash", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name: str, hint_on: bool) -> float:
        # the toggle is read at plan-construction time inside _shuffle_hash
        os.environ["MLFS_FORCE_SHUFFLE_HASH"] = "1" if hint_on else ""
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        return time.perf_counter() - t0

    # warm both modes (JIT + parquet footers) before timing
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in QUERIES:
        for hint_on in (True, False):
            run(name, hint_on) if not os.path.isdir(warm_dir) else None
    if os.path.isdir(warm_dir):
        sf_warm, sys.argv[1:2] = warm_dir, []
        for name in QUERIES:
            for hint_on in (True, False):
                os.environ["MLFS_FORCE_SHUFFLE_HASH"] = "1" if hint_on else ""
                _force(qs[name](spark, sf_warm))

    walls: dict[str, dict[str, list[float]]] = {
        n: {"hint_on": [], "hint_off": []} for n in QUERIES
    }
    for _ in range(reps):
        for name in QUERIES:
            for key, hint_on in (("hint_on", True), ("hint_off", False)):
                walls[name][key].append(run(name, hint_on))

    os.environ.pop("MLFS_FORCE_SHUFFLE_HASH", None)
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "queries": {
            n: {
                k: round(min(v), 3)
                for k, v in walls[n].items()
            }
            for n in QUERIES
        },
        "all_walls": {
            n: {k: [round(x, 3) for x in v] for k, v in walls[n].items()}
            for n in QUERIES
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
