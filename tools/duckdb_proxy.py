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
    # Cap spill so one pathological oracle fails FAST instead of filling
    # the disk and killing the whole run (q89's oracle at sf1 spilled
    # >79 GB); a per-query failure is itself a pairing datapoint (DNF).
    con.execute("SET max_temp_directory_size = '30GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    failed = {}
    for name in sorted(sqls):
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.monotonic()
                con.execute(sqls[name]).fetchall()
                best = min(best, time.monotonic() - t0)
        except Exception as e:  # noqa: BLE001 - record DNF, keep pairing
            failed[name] = f"{time.monotonic() - t0:.1f}s: {e}"[:300]
            print(f"{name} FAILED after {time.monotonic() - t0:.1f}s: {e}",
                  flush=True)
            continue
        times[name] = best
        print(f"{name} {best:.2f}s", flush=True)
    total = sum(times.values())
    # a DNF shrinks the sum — the total only means something when every
    # query finished; comparisons must go per-query (or check this flag)
    result = {"metric": "duckdb_proxy_total", "value": total, "unit": "sec",
              "total_valid": not failed,
              "queries": times, "failed": failed, "sf": sf_dir}
    print(json.dumps({"metric": "duckdb_proxy_total", "value": total,
                      "total_valid": not failed,
                      "n_queries": len(times), "n_failed": len(failed)}))
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
