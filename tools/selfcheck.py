#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: runs DuckDB on each
oracle_sql.json entry against the same parquet tables and compares with
the Verify parquet output (columns sorted by name, rows sorted, values
compared exactly; floats compared exactly first, then with rel-tol report).

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"schema: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}"))
        continue
    # normalize for sort/compare
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
        return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    e, g = norm(exp), norm(got)
    diff_cols = []
    for c in e.columns:
        ec, gc = e[c], g[c]
        try:
            if ec.dtype.kind == "f" or gc.dtype.kind == "f":
                ok = ((ec.isna() & gc.isna()) | (ec == gc)).all()
                if not ok:
                    close = ((ec.isna() & gc.isna()) |
                             (abs(ec - gc) <= 1e-9 * (abs(ec) + abs(gc) + 1))).all()
                    diff_cols.append(f"{c}{'(~close)' if close else '(FAR)'}")
            else:
                eq = (ec.astype(str).where(~ec.isna(), None) ==
                      gc.astype(str).where(~gc.isna(), None)) | (ec.isna() & gc.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    diff_cols.append(f"{c} e.g. oracle={ec[i]!r} spark={gc[i]!r}")
        except Exception as ex:
            diff_cols.append(f"{c} compare-error {ex}")
    if diff_cols:
        fails.append((name, "values: " + "; ".join(diff_cols[:4])))
    else:
        passes.append((name, len(exp)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
