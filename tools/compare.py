#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mimics the driver: for each query parquet under verifyOutDir, run the
matching oracle SQL (oracle_sql.json) in DuckDB with each testdata parquet
registered under its bare table name; sort columns by name, sort rows,
compare values cell-by-cell (exact for ints/strings/dates, tiny-epsilon
report for floats so we can see HOW far off a mismatch is).

Tooling only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    return sorted(
        (tuple(str(x) for x in r) for r in rows)
    )


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    import os
    names = sorted(
        n for n in os.listdir(out_dir)
        if os.path.isdir(f"{out_dir}/{n}")
    )
    for name in names:
        spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [
            tuple(row[c] for c in spark_cols)
            for row in spark_tbl.to_pylist()
        ]
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows")
            continue
        try:
            duck = con.execute(oracle[name])
            duck_cols_raw = [d[0] for d in duck.description]
            duck_all = duck.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            fail += 1
            continue
        duck_cols = sorted(duck_cols_raw)
        if duck_cols != spark_cols:
            print(f"SCHEMA-MISMATCH {name}: spark={spark_cols} duck={duck_cols}")
            fail += 1
            continue
        idx = [duck_cols_raw.index(c) for c in duck_cols]
        duck_rows = [tuple(r[i] for i in idx) for r in duck_all]
        if len(duck_rows) != len(spark_rows):
            print(f"ROWCOUNT-MISMATCH {name}: spark={len(spark_rows)} duck={len(duck_rows)}")
            fail += 1
            continue
        sr, dr = canon(spark_rows), canon(duck_rows)
        if sr == dr:
            print(f"OK {name} ({len(spark_rows)} rows)")
            ok += 1
        else:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"VALUE-MISMATCH {name}: {len(bad)}/{len(sr)} rows differ; first: ")
            for a, b in bad[:3]:
                print(f"   spark={a}\n   duck ={b}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {len(names)-ok-fail} rows-only")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
