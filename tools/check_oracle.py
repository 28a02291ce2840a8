#!/usr/bin/env python3
"""Local reproduction of the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
testdata parquet tables, reads the Spark result parquet from
<outdir>/<name>/, and compares: row count, column names, and values
(columns sorted by name, rows sorted by all columns, exact equality).

Usage: python3 tools/check_oracle.py <sfdir> <outdir>
This is a dev-only tool (driver-side python env), not part of the
shipped library.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    import os
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # ScaleUp-generated dirs are directories named t.parquet
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1; continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1; continue
            ok = True
            for c in exp.columns:
                e, g = exp[c].values, got[c].values
                # Driver's hash is dtype-sensitive: a DuckDB HUGEINT (-> float64/object
                # in pandas) vs Spark BIGINT (int64) must FAIL here too, or local green
                # lies about driver green. An int column on one side that is float or
                # object on the other is exactly the HUGEINT signature.
                num_mismatch = ({e.dtype.kind, g.dtype.kind} & {'i', 'u'}) and \
                               ({e.dtype.kind, g.dtype.kind} & {'f', 'O'})
                if num_mismatch:
                    print(f"FAIL {name}: col {c} dtype mismatch exp={e.dtype} got={g.dtype}"
                          " (DuckDB HUGEINT? CAST the oracle output)")
                    ok = False; break
                if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                    same = np.array_equal(e.astype('float64'), g.astype('float64'), equal_nan=True)
                else:
                    ee = pd.Series(e).astype(str).values
                    gg = pd.Series(g).astype(str).values
                    same = (ee == gg).all()
                if not same:
                    bad = None
                    try:
                        if e.dtype.kind == 'f':
                            idx = np.where(~((e == g) | (pd.isna(e) & pd.isna(g))))[0]
                        else:
                            idx = np.where(pd.Series(e).astype(str).values != pd.Series(g).astype(str).values)[0]
                        if len(idx): bad = (idx[0], e[idx[0]], g[idx[0]])
                    except Exception: pass
                    print(f"FAIL {name}: col {c} differs (exp_dtype={e.dtype} got_dtype={g.dtype}) first_bad={bad}")
                    ok = False; break
            if ok:
                print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
            else:
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: exception {ex}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
