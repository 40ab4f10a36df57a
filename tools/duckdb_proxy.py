#!/usr/bin/env python3
"""Same-box DuckDB proxy: time every oracle SQL from a Verify dump's
oracle_sql.json against the same parquet tables (32 threads, best-of-2 —
mirroring graft.Bench's steady-state methodology).

Usage: python3 tools/duckdb_proxy.py <sfDir> <oracle_sql.json> [out.json]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    sqls = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    for name in sorted(sqls):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            con.execute(sqls[name]).fetchall()
            best = min(best, time.monotonic() - t0)
        times[name] = best
        print(f"{name} {best:.2f}s", flush=True)
    total = sum(times.values())
    result = {"metric": "duckdb_proxy_total", "value": total, "unit": "sec",
              "queries": times, "sf": sf_dir}
    print(json.dumps({"metric": "duckdb_proxy_total", "value": total,
                      "n_queries": len(times)}))
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
