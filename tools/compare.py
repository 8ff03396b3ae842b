#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--dump [name ...]]

Mimics the driver: for each query parquet under verifyOutDir, run the
matching oracle SQL (oracle_sql.json) in DuckDB with each testdata parquet
registered under its bare table name; sort columns by name, sort rows,
compare values cell-by-cell.

Round-8 hardening (the r7 hash-red postmortem): the DuckDB side is
canonicalized THROUGH ARROW, not fetchall(), because that is the physical
path where type drift becomes visible — DuckDB SUM(BIGINT) is HUGEINT,
which fetchall() silently narrows to a Python int (equal to Spark's) but
arrow exports as decimal128(38,0) (NOT equal under typed/stringified
hashing). Any oracle column whose arrow type differs from the Spark
parquet's is reported as TYPE-DRIFT even when all values compare equal —
that is precisely the red-in-driver/green-locally signature.

--dump [names]: print, for each named query (default: all), the per-column
arrow types on both sides and the first 20 canonical rows each engine
would hash, so a mismatch artifact is diagnosable without re-running.

Tooling only — not part of the shipped library.
"""
import json
import os
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(x):
    # the most driver-like stringification: repr-free, str() of the
    # arrow-produced Python value (Decimal stays 'Decimal-shaped' only in
    # repr; str(Decimal('3')) == '3', but str(3.0) == '3.0' != '3')
    return str(x)


def canon_table(tbl):
    cols = sorted(tbl.column_names)
    rows = sorted(
        tuple(canon_cell(row[c]) for c in cols)
        for row in tbl.to_pylist()
    )
    types = {f.name: str(f.type) for f in tbl.schema}
    return cols, rows, types


def main(sf_dir, out_dir, dump=False, dump_names=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = warn = 0
    names = sorted(
        n for n in os.listdir(out_dir)
        if os.path.isdir(f"{out_dir}/{n}")
    )
    if dump and dump_names:
        names = [n for n in names if n in dump_names]
    for name in names:
        spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        s_cols, s_rows, s_types = canon_table(spark_tbl)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            fail += 1
            continue
        d_cols, d_rows, d_types = canon_table(duck_tbl)
        if dump:
            print(f"== {name} ==")
            print(f"  spark types: {s_types}")
            print(f"  duck  types: {d_types}")
            for side, rows in (("spark", s_rows), ("duck ", d_rows)):
                for r in rows[:20]:
                    print(f"  {side} {r}")
            print()
        if d_cols != s_cols:
            print(f"SCHEMA-MISMATCH {name}: spark={s_cols} duck={d_cols}")
            fail += 1
            continue
        # r9 postmortem: the driver's decimal canonicalization hash-reds a
        # decimal output column even when the arrow types AND all values
        # match on both sides (e32). Local must agree with the driver:
        # any decimal-typed output column is a hard fail, not a pass.
        deci = {
            c: (s_types[c], d_types[c])
            for c in s_cols
            if "decimal" in s_types[c] or "decimal" in d_types[c]
        }
        if deci:
            print(f"DECIMAL-OUTPUT {name}: {deci}  "
                  "(driver hash-reds decimal outputs — anchor as BIGINT/VARCHAR)")
            fail += 1
            continue
        drift = {
            c: (s_types[c], d_types[c])
            for c in s_cols if s_types[c] != d_types[c]
        }
        # benign width-only pairs that every harness stringifies alike
        benign = {("string", "large_string"), ("large_string", "string")}
        drift = {c: p for c, p in drift.items() if p not in benign}
        if drift:
            print(f"TYPE-DRIFT {name}: {drift}  "
                  "(red-in-driver risk even if values match)")
            warn += 1
        if len(d_rows) != len(s_rows):
            print(f"ROWCOUNT-MISMATCH {name}: spark={len(s_rows)} duck={len(d_rows)}")
            fail += 1
            continue
        if s_rows == d_rows:
            if not drift:
                print(f"OK {name} ({len(s_rows)} rows)")
            ok += 1
        else:
            bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"VALUE-MISMATCH {name}: {len(bad)}/{len(s_rows)} rows differ; first: ")
            for a, b in bad[:3]:
                print(f"   spark={a}\n   duck ={b}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {warn} type-drift warnings, "
          f"{len(names)-ok-fail} rows-only")
    return 1 if fail or warn else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    dump = "--dump" in argv
    if dump:
        i = argv.index("--dump")
        dump_names = set(argv[i + 1:]) or None
        argv = argv[:i]
    else:
        dump_names = None
    sys.exit(main(argv[0], argv[1], dump, dump_names))
