#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL over the same parquet tables, compare
row-count / schema / value-hash per query (columns sorted by name, rows
sorted by all columns). Usage: check.py <sfDir> <verifyOutDir>.

Bug-compatibility contract with the driver's harness (learned in round
6, q82): the driver sorts result rows with pandas `sort_values`, which
RAISES `TypeError: unhashable type` on any non-scalar cell (ndarray /
list / dict). This replica must never be more permissive than the
driver, so:
  1. rows are sorted with the same `sort_values` call (errors surface
     as ERR, exactly like the driver's gate), and
  2. an explicit pre-lint rejects array/struct-typed output columns in
     any oracle-bearing query with a named DRIVER_INCOMPAT status, so
     the failure is diagnosable locally before the driver ever runs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def nonscalar_cols(df: pd.DataFrame):
    """Columns whose cells the driver's sort_values cannot handle."""
    bad = []
    for c in df.columns:
        col = df[c].dropna()
        probe = col.head(20)
        if any(isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray"
               for v in probe):
            bad.append(c)
    return bad

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver's row sort, verbatim: pandas sort_values over every
    # column. Do NOT pre-stringify cells — that masked q82's
    # array<long> schema locally while the driver failed on it.
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return repr(v)
        return str(v)
    return ["|".join(cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]

def h(rows):
    m = hashlib.md5()
    for r in rows:
        m.update(r.encode()); m.update(b"\n")
    return m.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = {"status": "NO_OUTPUT"}
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            results[name] = {"status": "ROWS_ONLY", "rows": len(got),
                             "ok": len(got) > 0}
            continue
        # schema lint: the driver's gate cannot hash non-scalar cells —
        # reject them by name before the sort obscures the cause
        bad_cols = nonscalar_cols(got)
        if bad_cols:
            results[name] = {"status": "DRIVER_INCOMPAT",
                             "nonscalar_columns": bad_cols,
                             "hint": "emit arrays/structs as joined strings "
                                     "or exploded rows in query AND oracle"}
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = {"status": "ORACLE_SQL_ERROR", "error": str(e)[:300]}
            continue
        try:
            gc, ec = canon(got), canon(exp)
        except Exception as e:
            # the driver reports the raw sort/hash exception as err
            results[name] = {"status": "ERR", "error": str(e)[:300]}
            continue
        schema_ok = sorted(got.columns) == sorted(exp.columns)
        ok = (len(gc) == len(ec)) and schema_ok and h(gc) == h(ec)
        res = {"status": "MATCH" if ok else "MISMATCH",
               "rows": len(gc), "oracle_rows": len(ec), "schema_ok": schema_ok}
        if not ok:
            # show first diffs
            gs, es = set(gc), set(ec)
            res["only_in_spark"] = sorted(gs - es)[:3]
            res["only_in_oracle"] = sorted(es - gs)[:3]
            res["spark_cols"] = list(sorted(got.columns))
            res["oracle_cols"] = list(sorted(exp.columns))
        results[name] = res
    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    n_rows_only = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY" and r.get("ok"))
    bad = {k: v for k, v in results.items()
           if v["status"] not in ("MATCH",) and not (v["status"] == "ROWS_ONLY" and v.get("ok"))}
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_match} MATCH, {n_rows_only} ROWS_ONLY-ok, {len(bad)} BAD of {len(results)}")
    if bad:
        print("BAD:", list(bad))
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
