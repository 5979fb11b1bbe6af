#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [skip1,skip2]

Runs each SQL in <verifyOutDir>/oracle_sql.json in DuckDB with views over
the same parquet tables, reads the Spark result parquet from
<verifyOutDir>/<name>/, and compares: column names (sorted), row count,
and exact values after sorting rows by all columns.

The optional third argument names queries to skip (comma-separated) —
e.g. d11_neardup_groups at sf0.1, whose recursive-CTE oracle is a
transitive closure that cannot finish on that scale's giant component
(the driver's gate runs at sf0.01, where it is fast).
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame_to_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir, skip=""):
    skipped = set(filter(None, skip.split(",")))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skipped:
            print(f"SKIP {name}")
            continue
        sql = oracle[name]
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        parts = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = con.sql(f"SELECT * FROM read_parquet({parts!r})").df()
        ocols, orows = frame_to_rows(odf)
        scols, srows = frame_to_rows(sdf)
        if ocols != scols:
            print(f"FAIL {name}: schema oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        if orows != srows:
            bad = sum(1 for a, b in zip(orows, srows) if a != b)
            print(f"FAIL {name}: {bad}/{len(orows)} rows differ; first:")
            for a, b in zip(orows, srows):
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
