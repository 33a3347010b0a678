"""Deterministic bench-scale-up: replicate the driver's sf0.1 tables K times
with shifted keys so the BENCH workload (panel windows, doc dedup, ANN join,
event sessionization) grows by K while staying the same logical queries.

The driver's testdata is read-only and capped at sf0.1; the judge's bench
question is whether the Spark-vs-DuckDB marginal ratio converges at larger
data volumes, which needs larger inputs. This scale-up:

- nation: K replicas (``n_name || '_r' || k``, nationkey offset 25k) — the
  panel's unique_id is the nation name, so the panel gets K× series with the
  same calendar (the window/feature workload scales by K).
- customer/orders: K replicas with key offsets; each replica's customers
  point at its replica nations, orders at its replica customers. Prices get
  a small deterministic per-replica perturbation so replicated series are
  not bit-identical.
- documents: K replicas, ``' r<k>'`` appended to text (shingle sets shift
  slightly; dedup buckets grow K×).
- embeddings: K replicas with a per-(replica, dim) deterministic jitter.
- events: K replicas with user/event id offsets (K× sessionization groups).
- region/supplier/part/lineitem: copied unchanged (not on the bench path).

Usage: python tools/gen_scaled.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/sfscale/sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def reps(sql_tpl: str, name: str) -> None:
        union = " UNION ALL ".join(sql_tpl.format(k=i) for i in range(k))
        con.execute(
            f"COPY ({union}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    reps(
        f"SELECT n_nationkey + {{k}} * 25 AS n_nationkey,"
        f" n_name || '_r{{k}}' AS n_name, n_regionkey"
        f" FROM read_parquet('{src}/nation.parquet')",
        "nation",
    )
    ccount = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}/customer.parquet')"
    ).fetchone()[0]
    reps(
        f"SELECT c_custkey + {{k}} * {ccount} AS c_custkey, c_name,"
        f" c_nationkey + {{k}} * 25 AS c_nationkey, c_acctbal, c_mktsegment"
        f" FROM read_parquet('{src}/customer.parquet')",
        "customer",
    )
    ocount = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0]
    reps(
        f"SELECT o_orderkey + {{k}} * {ocount} AS o_orderkey,"
        f" o_custkey + {{k}} * {ccount} AS o_custkey, o_orderstatus,"
        f" ROUND(o_totalprice * (1.0 + {{k}} * 0.001), 2) AS o_totalprice,"
        f" o_orderdate, o_orderpriority"
        f" FROM read_parquet('{src}/orders.parquet')",
        "orders",
    )
    dcount = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    reps(
        f"SELECT doc_id + {{k}} * {dcount} AS doc_id,"
        f" text || ' r{{k}}' AS text, lang, source,"
        f" n_chars + CAST(3 AS BIGINT) AS n_chars"
        f" FROM read_parquet('{src}/documents.parquet')",
        "documents",
    )
    vcount = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]
    reps(
        f"SELECT vec_id + {{k}} * {vcount} AS vec_id,"
        f" CAST(list_transform(embedding, x -> x + {{k}} * 0.0003) AS FLOAT[])"
        f" AS embedding, label"
        f" FROM read_parquet('{src}/embeddings.parquet')",
        "embeddings",
    )
    ecount = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    ucount = 100000  # safe upper bound for user_id offsets
    reps(
        f"SELECT event_id + {{k}} * {ecount} AS event_id, ts,"
        f" user_id + {{k}} * {ucount} AS user_id, event_type, value, props"
        f" FROM read_parquet('{src}/events.parquet')",
        "events",
    )
    for t in ("region", "supplier", "part", "lineitem"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
