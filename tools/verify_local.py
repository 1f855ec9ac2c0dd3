#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf parquet tables and compares against the parquet dumps
graft.Verify wrote. Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists hashable/sortable for a canonical row order
    key = df.applymap(lambda v: str(v.tolist()) if isinstance(v, np.ndarray)
                      else str(list(v)) if isinstance(v, list) else str(v))
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

def eq_cell(a, b):
    if isinstance(a, np.ndarray): a = a.tolist()
    if isinstance(b, np.ndarray): b = b.tolist()
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq_cell(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b): return True
        return a == b
    return a == b

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result");  n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not eq_cell(got.iloc[i][c], want.iloc[i][c]):
                    bad = (i, c, got.iloc[i][c], want.iloc[i][c]); break
            if bad: break
        if bad:
            i, c, g, w = bad
            print(f"FAIL {name}: row {i} col {c}: spark={g!r} oracle={w!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
