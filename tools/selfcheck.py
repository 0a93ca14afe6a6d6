#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: runs DuckDB on each
oracle_sql.json entry against the same parquet tables and compares with
the Verify parquet output (columns sorted by name, rows sorted, values
compared exactly; floats compared exactly first, then with rel-tol report).

TYPE-STRICT: both sides also round-trip through arrow and their
canonicalized arrow types must match per column. The driver's hash is
type-sensitive (round 9: DuckDB HUGEINT vs Spark BIGINT hash-mismatched
x19 while every VALUE was identical, and the old astype(str) compare here
said PASS) — the local gate must be at least as strict as the driver's.

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def canon_type(t):
    """Canonical arrow type string: collapses representation-only variants
    (large_string vs string, dictionary encodings, timestamp tz spellings)
    while preserving every semantic difference the driver's hash can see
    (int32 vs int64, int64 vs decimal128/HUGEINT, float vs double)."""
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}: {canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)}, {canon_type(t.item_type)}>"
    if pa.types.is_timestamp(t):
        # unit (us vs ns) is a writer choice; tz presence is semantic
        return f"timestamp[{'tz' if t.tz else 'ntz'}]"
    if pa.types.is_null(t):
        return "null"  # all-null column: wildcard, handled by caller
    return str(t)


def arrow_types(tbl):
    return {f.name: canon_type(f.type) for f in tbl.schema}


sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp_arrow = con.execute(sql).arrow()
        exp = exp_arrow.to_pandas()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    try:
        got_arrow = pq.read_table(f"{outdir}/{name}")
        got = got_arrow.to_pandas()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"schema: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    etypes, gtypes = arrow_types(exp_arrow), arrow_types(got_arrow)
    type_diffs = [
        f"{c}: oracle={etypes[c]} spark={gtypes[c]}"
        for c in exp.columns
        if etypes[c] != gtypes[c] and "null" not in (etypes[c], gtypes[c])
    ]
    if type_diffs:
        fails.append((name, "types: " + "; ".join(type_diffs[:4])))
        continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}"))
        continue
    # The driver's comparator sorts raw values and cannot handle
    # list/array-typed cells (pandas "unhashable type" crash). Reject them
    # here so the local gate is at least as strict as the driver: every
    # collection column must be serialized (array_join) in the query.
    list_cols = [
        c for df in (exp, got) for c in df.columns
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, tuple, dict, set))
            or type(v).__name__ == "ndarray").any()
    ]
    if list_cols:
        fails.append((name, "raw collection-typed output column(s) "
                      f"{sorted(set(list_cols))} — driver cannot sort/hash; "
                      "serialize with array_join"))
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
