#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.2-1).

Usage: verify_oracle.py <sfDir> <outDir> [query ...]
       verify_oracle.py --selftest

Registers the fixture tables in DuckDB, runs each oracle_sql.json entry, and
compares to the Spark parquet dump THE WAY THE DRIVER DOES (round-8 lesson:
the old fetchall()-tuple compare read green while the driver's pandas path
read red, because DuckDB's Python API collapses HUGEINT to int while its
.df() path renders HUGEINT as float64, and pandas sort_values crashes on
ndarray cells):

  - oracle side fetched via con.execute(sql).df()  -> pandas dtypes
  - spark side read via pandas.read_parquet        -> pandas dtypes
  - columns reordered by sorted name, rows sorted by all columns,
    cell values compared by repr
  - HARD dtype gate first: any unstable dtype (float64 on an oracle
    integer aggregate = HUGEINT leak; object cells that aren't
    str/date/None = array/struct output the driver cannot sort) fails the
    query even when the reprs would accidentally agree.

Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.
"""
import sys, json, glob, datetime, tempfile, os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# pandas dtypes a declared output may carry (SURVEY §2.0 D9).
STABLE_KINDS = set("iufbM")  # int/uint/float/bool/datetime64


def unstable_object_cell(v):
    return not (v is None or isinstance(v, (str, datetime.date))
                or (isinstance(v, float) and np.isnan(v)))


def dtype_problems(df, side):
    probs = []
    for c in df.columns:
        k = df[c].dtype.kind
        if k in STABLE_KINDS:
            continue
        if df[c].dtype == object:
            bad = [v for v in df[c].head(50) if unstable_object_cell(v)]
            if bad:
                probs.append(f"{side}.{c}: object dtype with "
                             f"{type(bad[0]).__name__} cells (D9 violation)")
        else:
            probs.append(f"{side}.{c}: unstable dtype {df[c].dtype}")
    return probs


def canon(df):
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df


def cell_repr(v):
    # Dates vs midnight timestamps compare equal under the driver (its
    # frame-level formatting drops an all-midnight time component): Spark
    # parquet DATE -> pandas object of datetime.date, DuckDB DATE -> .df()
    # datetime64[us]. Canonicalize both to ISO date when time is midnight.
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        v = pd.Timestamp(v).to_pydatetime()
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def datelike(s):
    if s.dtype.kind == "M":
        return True
    return s.dtype == object and all(
        v is None or isinstance(v, datetime.date) for v in s.head(50))


def frame_rows(df):
    return [tuple(cell_repr(v) for v in row)
            for row in df.itertuples(index=False)]


def compare(name, exp, got):
    """Driver-shaped compare; returns None on pass, message on fail."""
    probs = dtype_problems(exp, "oracle") + dtype_problems(got, "spark")
    if probs:
        return "dtype gate: " + "; ".join(probs)
    if sorted(exp.columns) != sorted(got.columns):
        return (f"cols spark={sorted(got.columns)} "
                f"oracle={sorted(exp.columns)}")
    # dtype drift between the two sides (e.g. oracle float64 vs spark int64
    # = HUGEINT leak) is the round-8 class — name it explicitly.
    exp_c, got_c = canon(exp), canon(got)
    drift = [f"{c}: spark={got_c[c].dtype} oracle={exp_c[c].dtype}"
             for c in exp_c.columns
             if exp_c[c].dtype.kind != got_c[c].dtype.kind
             and not (datelike(exp_c[c]) and datelike(got_c[c]))]
    if drift:
        return "dtype drift (HUGEINT leak?): " + "; ".join(drift)
    if len(exp_c) != len(got_c):
        return f"rows spark={len(got_c)} oracle={len(exp_c)}"
    e_rows, g_rows = frame_rows(exp_c), frame_rows(got_c)
    for i, (g, e) in enumerate(zip(g_rows, e_rows)):
        if g != e:
            return f"first diff at sorted row {i}:\n  spark : {g}\n  oracle: {e}"
    return None


def selftest():
    """Negative control: a doctored HUGEINT oracle MUST fail this harness."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.parquet")
        con.execute(
            f"COPY (SELECT CAST(3 AS BIGINT) AS s) TO '{p}' (FORMAT PARQUET)")
        got = pd.read_parquet(p)
        # uncast SUM of integers -> HUGEINT -> .df() float64
        exp = con.execute(
            "SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)").df()
        msg = compare("hugeint_control", exp, got)
        assert msg is not None and "dtype" in msg, (
            f"HUGEINT negative control PASSED the harness: {msg}")
        # array-valued output -> object/ndarray cells
        exp2 = con.execute("SELECT [1,2,3] AS arr").df()
        msg2 = compare("array_control", exp2, exp2.copy())
        assert msg2 is not None and "D9" in msg2, (
            f"array negative control PASSED the harness: {msg2}")
        # positive control: cast oracle passes
        exp3 = con.execute(
            "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)"
        ).df()
        msg3 = compare("cast_control", exp3, got)
        assert msg3 is None, f"positive control FAILED: {msg3}"
    print("selftest OK: HUGEINT + array negative controls fail, cast passes")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
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
            exp = con.execute(sql).df()
            got = pd.read_parquet(f"{outdir}/{name}")
            msg = compare(name, exp, got)
        except Exception as ex:
            msg = f"{type(ex).__name__}: {ex}"
        if msg:
            print(f"FAIL {name}: {msg}")
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
