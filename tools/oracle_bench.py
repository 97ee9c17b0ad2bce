#!/usr/bin/env python3
"""Time the DuckDB oracle suite on a given sf dir — the baseline side
of the bench comparison, measured in the same session/environment as
the Spark side so the ratio is artifact-derived (round-6 ADVICE: the
published bench_vs_baseline mixed a fresh Spark number with a
round-old oracle wall).

Usage:
  python3 tools/oracle_bench.py <sf_dir> <oracle_sql.json> [out.json]

Runs every oracle query once (materialized via .fetchall()), prints a
one-line JSON summary {total_s, n, per_query} and optionally writes it
to out.json.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    threads = os.environ.get("ORACLE_THREADS")
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads = {int(threads)}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(oracle_path))
    per = {}
    t_all = time.time()
    for name in sorted(oracles):
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        per[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)
    line = json.dumps({"metric": "oracle_total", "value": total,
                       "unit": "sec", "n": len(per), "sf": sf_dir,
                       "threads": int(threads) if threads else "all",
                       "per_query": per})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
