#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: registers the
testdata parquet as DuckDB views, executes each oracle_sql.json entry, and
compares against the Spark-written parquet (columns sorted by name, rows
compared in emitted order and as sorted multisets).

This script is development tooling only — the shipped library is pure Scala.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(cols, names):
    n = len(cols[0]) if cols else 0
    return [tuple(canon(c[i]) for c in cols) for i in range(n)]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:] or None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        gnames, enames = sorted(got.column_names), sorted(exp.column_names)
        if gnames != enames:
            print(f"FAIL {name}: columns spark={gnames} oracle={enames}")
            n_fail += 1
            continue
        grows = rows_of([got.column(c).to_pylist() for c in gnames], gnames)
        erows = rows_of([exp.column(c).to_pylist() for c in enames], enames)
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        elif sorted(map(repr, grows)) == sorted(map(repr, erows)):
            print(f"WARN {name}: set-equal but row order differs")
            n_fail += 1
        else:
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows")
            for i, (g, e) in enumerate(zip(grows, erows)):
                if g != e:
                    print(f"  first diff at row {i}:\n    spark={g}\n    duck ={e}")
                    break
            if len(grows) != len(erows):
                sg, se = set(map(repr, grows)), set(map(repr, erows))
                print(f"  only-spark: {list(sg - se)[:2]}")
                print(f"  only-duck : {list(se - sg)[:2]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
