#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the working baseline for BENCH ratios.

Usage: python3 tools/oracle_bench.py <outDir> <sfDir> [runs]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs every
oracle query in DuckDB at <sfDir> with all cores, and prints per-query
medians plus the total as one JSON line. Run it in the SAME minutes as
graft.Bench when quoting Spark-vs-oracle ratios — the box's tenant
contention swings 1.5-4x between windows.
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:  # noqa: BLE001 — record and move on
                print(f"[oracle] {name} failed: {e}", file=sys.stderr)
                break
            times.append(time.time() - t0)
        if times:
            results[name] = statistics.median(times)
    total = sum(results.values())
    print(json.dumps({"metric": "oracle_total", "value": total, "unit": "sec",
                      "queries": results, "sf": sf_dir}))


if __name__ == "__main__":
    main()
