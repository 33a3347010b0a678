"""A/B the IVF centroid probe: literal-projection plan vs join+window
fallback.

Round-8 rewrote `_centroid_probe` from a broadcast-join + per-key
row_number window into an inlined literal array projection (zero probe
shuffles, 11 -> 8 jobs), and the same round's driver bench showed
`ann_ivf_probe` +17% — alongside +13-18% moves on queries whose code did
NOT change and a +15% move of the DuckDB oracle itself, so machine noise
was the prime suspect. Round-9 additionally rebuilt the literal as a
single JVM-parsed SQL string (~9x less py4j construction). This tool
settles the question the round-8 verdict asked: interleaved warm reps of
the full `ann_ivf_probe` query under each probe strategy in ONE session,
per-mode MIN (the noise-robust statistic on this sandbox).

The fallback is forced by lowering `_PROBE_LITERAL_MAX_CELLS` to 0 at call
time (the constant is read per call), which routes every quantizer through
the join+window path.

Usage:
    python tools/ab_centroid_probe.py [sf_dir] [reps]

Prints one JSON line:
    {"sf_dir": ..., "reps": N, "query": "ann_ivf_probe",
     "literal_sec": s, "join_window_sec": s}
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mlforecast_spark.utils import get_spark
    import mlforecast_spark.operators.similarity as sim

    spark = get_spark("ab-centroid-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    fn = entry.queries()["ann_ivf_probe"]
    default_max = sim._PROBE_LITERAL_MAX_CELLS

    def run(mode: str) -> float:
        sim._PROBE_LITERAL_MAX_CELLS = default_max if mode == "literal" else 0
        try:
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            return time.perf_counter() - t0
        finally:
            sim._PROBE_LITERAL_MAX_CELLS = default_max

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for mode in ("literal", "join_window"):
        run(mode)
        if os.path.isdir(warm_dir):
            sim._PROBE_LITERAL_MAX_CELLS = (
                default_max if mode == "literal" else 0
            )
            _force(fn(spark, warm_dir))
            sim._PROBE_LITERAL_MAX_CELLS = default_max

    best = {"literal": float("inf"), "join_window": float("inf")}
    for _ in range(reps):
        for mode in ("literal", "join_window"):
            best[mode] = min(best[mode], run(mode))

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "query": "ann_ivf_probe",
                "literal_sec": round(best["literal"], 3),
                "join_window_sec": round(best["join_window"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
