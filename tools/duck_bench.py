#!/usr/bin/env python3
"""DuckDB proxy timing for the perf gate.

Usage: duck_bench.py <sfDir> <oracle_sql.json> [passes]

Runs every oracle SQL against the sfDir parquet tables in DuckDB
(32 threads), `passes` full passes (default 2), reports per-query
MIN seconds and the total — the same discipline as graft.Bench, so
the Spark-vs-DuckDB ratio compares like with like. Results are
materialized (fetchall) to force full evaluation.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_path: str, passes: int = 2) -> None:
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    best = {}
    for _ in range(passes):
        for name, sql in sorted(oracle.items()):
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
                dt = time.time() - t0
            except Exception as e:
                dt = -1.0
                print(f"ERR {name}: {e}", file=sys.stderr)
            prev = best.get(name)
            if prev is None or (0 <= dt < prev):
                best[name] = dt
    total = sum(v for v in best.values() if v >= 0)
    slowest = sorted(best.items(), key=lambda kv: -kv[1])
    print(json.dumps({"total": round(total, 3), "n": len(best),
                      "slowest": [(k, round(v, 3)) for k, v in slowest[:15]]}))
    json.dump(best, open("/tmp/duck_bench.json", "w"))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
