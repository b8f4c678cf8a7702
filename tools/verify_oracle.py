#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.2-1).

Usage: verify_oracle.py <sfDir> <outDir> [query ...]

Registers the fixture tables in DuckDB, runs each oracle_sql.json entry, and
compares to the Spark parquet dump row-for-row (order-sensitive, column names
and values). Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.
"""
import sys, json, glob, datetime

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    # Compare canonical string forms, not Python equality: the driver hashes
    # value reprs, and Decimal('1.50') == Decimal('1.5') is True in Python
    # while '1.50' != '1.5' under any repr-based hash (round-1 shipped 9 such
    # failures). Type name included so int-vs-float etc. also fail loudly.
    return (type(v).__name__, str(v))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            exp = con.execute(sql).fetchall()
            expcols = [d[0] for d in con.description]
            got = con.execute(
                f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
            gotcols = [d[0] for d in con.description]
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            fails += 1
            continue
        if expcols != gotcols:
            print(f"FAIL {name}: cols spark={gotcols} oracle={expcols}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            fails += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if tuple(map(norm, g)) != tuple(map(norm, e)):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: first diff at row {i}:\n  spark : {g}\n  oracle: {e}")
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
