#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
registered for every testdata table, and compares: columns sorted by name,
rows sorted by all columns, exact value equality (floats compared exactly,
near-misses reported with max abs diff).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        # NaN-safe lexicographic sort: pandas multi-key sort_values breaks
        # secondary ordering within NaN groups, so sort on a string key.
        key = df.apply(
            lambda row: "\x00".join("\x01" if pd.isna(v) else repr(v) for v in row), axis=1)
        df = df.iloc[key.argsort(kind="mergesort")]
    return df.reset_index(drop=True)


# Schema-drift tripwire (round-8 lesson: the driver regenerated events.ts
# under a different physical type and 15 queries silently crashed). Key
# columns whose LOGICAL type the loaders and oracle SQL both depend on —
# any drift fails loudly here, before a confusing hash mismatch.
EXPECTED_TYPES = {
    "events": {"ts": {"timestamp", "int64"}, "event_id": {"int64"},
               "user_id": {"int64"}, "event_type": {"string", "large_string"}},
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"}},
    "embeddings": {"vec_id": {"int64"}},
    "lineitem": {"l_orderkey": {"int64"}},
    "orders": {"o_orderkey": {"int64"}},
}


def check_table_schemas(sf_dir):
    import pyarrow.parquet as pq
    drift = []
    for t, cols in EXPECTED_TYPES.items():
        try:
            schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        except Exception as e:
            drift.append(f"{t}: unreadable ({e})")
            continue
        for c, allowed in cols.items():
            if c not in schema.names:
                drift.append(f"{t}.{c}: column missing")
                continue
            base = str(schema.field(c).type).split("[")[0]
            if base not in allowed:
                drift.append(f"{t}.{c}: parquet type {schema.field(c).type} "
                             f"not in expected {sorted(allowed)}")
    if drift:
        print("TESTDATA SCHEMA DRIFT — fix loaders/oracles before trusting "
              "any comparison below:")
        for d in drift:
            print(f"  ! {d}")
    return drift


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    check_table_schemas(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"columns differ: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    ra = a.map(lambda v: "\x01" if pd.isna(v) else repr(v))
                    rb = b.map(lambda v: "\x01" if pd.isna(v) else repr(v))
                    eq = ra == rb
                    bad = int((~eq).sum())
                except Exception as e:
                    problems.append(f"col {c}: compare error {e}")
                    continue
                if bad:
                    idx = (~eq).idxmax()
                    problems.append(
                        f"col {c}: {bad}/{len(a)} values differ; first at row {idx}: "
                        f"spark={a[idx]!r} duck={b[idx]!r}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(spark_df)} rows x {len(spark_df.columns)} cols)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
