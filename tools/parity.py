#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare to the Verify parquet dumps
(columns sorted by name, rows sorted, exact values).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

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
        got = pd.read_parquet(qdir)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            if str(gv.dtype) != str(ev.dtype):
                bad.append(f"dtype[{c}]: spark={gv.dtype} duck={ev.dtype}")
            try:
                if gv.dtype == object:
                    neq = (gv.astype(str) != ev.astype(str)) & ~(gv.isna() & ev.isna())
                else:
                    neq = ~((gv == ev) | (gv.isna() & ev.isna()))
                n = int(neq.sum())
                if n:
                    i = neq.idxmax()
                    bad.append(f"value[{c}]: {n} diffs e.g. row{i} spark={gv[i]!r} duck={ev[i]!r}")
            except Exception as ex:
                bad.append(f"cmp[{c}] failed: {ex}")
        results[name] = "OK" if not bad else "FAIL " + "; ".join(bad[:3])
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v)
    for k, v in results.items():
        print(f"{'✓' if v=='OK' or (v.startswith('ROWS_ONLY') and 'EMPTY' not in v) else '✗'} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    missing = [q for q in oracle if q not in results]
    if missing:
        print("oracle entries with no parquet output:", missing)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
