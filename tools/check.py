#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]

Reads each <outdir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from <outdir>/oracle_sql.json in DuckDB against
the same sf tables, and compares: row count, column names (sorted), and
values (rows sorted by all columns, compared with exact equality; floats
additionally reported as max-abs-diff so near-misses are visible).

This mirrors the driver's hash compare (sorts columns by name before
hashing) but gives diagnostics instead of a bare pass/fail.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # arrays/lists -> tuples for sortability
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) == "object" and len(df) and isinstance(df[c].iloc[0], type(pd.Timestamp("2020-01-01").date())):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def compare(name, a, b):
    if a is None:
        return f"FAIL {name}: spark output missing"
    if sorted(a.columns) != sorted(b.columns):
        return f"FAIL {name}: columns spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    # Dtype parity matters for the driver's hash compare even when values
    # are numerically equal (round 1: DuckDB sign()->int8 vs Spark
    # signum()->float64 hash-mismatched). Flag kind-level differences
    # (int vs float vs object); width differences (int32 vs int64) are
    # normalized by both sides.
    kind_bad = []
    nkind = lambda k: {"u": "i"}.get(k, k)
    for c in sorted(a.columns):
        ka, kb = nkind(a[c].dtype.kind), nkind(b[c].dtype.kind)
        # date columns: spark parquet reads as object(datetime.date),
        # duckdb fetchdf as datetime64 — same logical type, skip.
        if {ka, kb} == {"O", "M"}:
            continue
        if ka != kb:
            kind_bad.append(f"{c}: spark={a[c].dtype} oracle={b[c].dtype}")
    if kind_bad:
        return f"FAIL {name}: dtype kind mismatch — " + "; ".join(kind_bad[:4])
    if len(a) != len(b):
        return f"FAIL {name}: rows spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64"); bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                d = (av - bv).abs().max()
                bad.append(f"{c}: {int((~eq).sum())} diffs, maxabs={d:.3e}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    if bad:
        return f"FAIL {name}: " + "; ".join(bad[:4])
    return f"PASS {name} ({len(a)} rows)"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    dirs = {n for n in os.listdir(outdir) if os.path.isdir(f"{outdir}/{n}")}
    for name in sorted(dirs | set(oracles)):
        if only and name not in only:
            continue
        if name not in dirs:
            print(f"FAIL {name}: no spark output (query threw in Verify?)")
            n_fail += 1
            continue
        if name not in oracles:
            df = load_spark(outdir, name)
            print(f"INFO {name}: rows-only check, {0 if df is None else len(df)} rows")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
            msg = compare(name, load_spark(outdir, name), oracle)
        except Exception as e:
            msg = f"FAIL {name}: oracle error: {e}"
        print(msg)
        if msg.startswith("PASS"): n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
