#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Replicates the driver's compare as closely as we can infer: run each
oracle SQL in DuckDB over the sf tables, read the Spark parquet dump,
sort columns by name, sort rows, compare values exactly (floats must be
bit-identical — the query layer is designed for that).
"""
import duckdb, glob, json, sys
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def col_eq(a: pd.Series, b: pd.Series) -> np.ndarray:
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        av = a.astype(float).values
        bv = b.astype(float).values
        return (av == bv) | (np.isnan(av) & np.isnan(bv))
    an = pd.isna(a).values
    bn = pd.isna(b).values
    eq = a.astype(object).values == b.astype(object).values
    return (eq & ~an & ~bn) | (an & bn)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"{name}: FAIL missing spark output")
            fails += 1
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: FAIL oracle sql error: {e}")
            fails += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"{name}: FAIL cols got={list(got.columns)} exp={list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"{name}: FAIL rows got={len(got)} exp={len(exp)}")
            fails += 1
            continue
        cols = list(got.columns)
        gs = got.sort_values(by=cols, na_position="first").reset_index(drop=True)
        es = exp.sort_values(by=cols, na_position="first").reset_index(drop=True)
        bad = np.zeros(len(gs), dtype=bool)
        for c in cols:
            bad |= ~col_eq(gs[c], es[c])
        dtw = ""
        dtg, dte = gs.dtypes.to_dict(), es.dtypes.to_dict()
        diff_dt = {c: (str(dtg[c]), str(dte[c])) for c in cols if dtg[c] != dte[c]}
        if diff_dt:
            dtw = f"  [dtype-diff {diff_dt}]"
        if bad.any():
            n = int(bad.sum())
            print(f"{name}: FAIL {n}/{len(gs)} rows differ{dtw}")
            with pd.option_context("display.width", 200, "display.max_columns", 50):
                print("  spark:", gs[bad].head(2).to_dict("records"))
                print("  duck :", es[bad].head(2).to_dict("records"))
            fails += 1
        else:
            print(f"{name}: OK rows={len(gs)}{dtw}")
    # queries without oracle → rows-only, just note them
    have = set(oracle)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = d.rstrip("/").split("/")[-1]
        if qn not in have:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{qn}: rows-only n={n}")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
