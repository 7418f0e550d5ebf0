#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet under <verifyOutDir>/<name>/, runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same tables,
sorts columns by name + rows by all columns, and compares (exact for
ints/strings, tiny tolerance for floats). Prints per-query status.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_result(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int32/int64/nullable
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_lint(ours, ref):
    """Pre-unification dtype check (round-6 q177 lesson).

    The driver's value hasher is format-sensitive: a DuckDB HUGEINT (from a
    window sum over BIGINT) reaches pandas as float64/object and renders
    "3.0" against Spark's int64 "3" — rows/schema checks pass, the hash
    does not.  Warn whenever the same column is integer on one side but
    float/object-numeric on the other, BEFORE normalize() papers over it.
    """
    warns = []
    for c in sorted(set(ours.columns) & set(ref.columns)):
        a, b = ours[c], ref[c]
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_num = a_int or pd.api.types.is_float_dtype(a)
        b_num = b_int or pd.api.types.is_float_dtype(b)
        if a_int != b_int and a_num and b_num:
            warns.append(f"{c}: spark={a.dtype} vs oracle={b.dtype}")
        elif b.dtype == object and a_num:
            # DuckDB HUGEINT/DECIMAL surfaces as object-of-ints in pandas
            warns.append(f"{c}: spark={a.dtype} vs oracle=object ({type(b.iloc[0]).__name__ if len(b) else 'empty'})")
    return warns


def compare(a, b):
    if list(a.columns) != list(b.columns):
        return f"column mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x):
            nx, ny = x.isna(), y.isna()
            if not nx.equals(ny):
                return f"null mismatch in {c}"
            close = np.isclose(x.fillna(0), y.fillna(0), rtol=1e-9, atol=1e-9)
            if not close.all():
                i = int(np.argmin(close))
                return f"value mismatch in {c} at row {i}: {x.iloc[i]} vs {y.iloc[i]}"
        else:
            if not x.astype(str).equals(y.astype(str)):
                diff = (x.astype(str) != y.astype(str))
                i = int(diff.idxmax())
                return f"value mismatch in {c} at row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = n_skip = n_warn = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res = load_result(out_dir, name)
        if res is None:
            print(f"[MISSING] {name}: no result parquet")
            n_fail += 1
            continue
        try:
            ref = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        for w in dtype_lint(res.reindex(sorted(res.columns), axis=1),
                            ref.reindex(sorted(ref.columns), axis=1)):
            print(f"[DTYPE-WARN] {name}: {w}")
            n_warn += 1
        err = compare(normalize(res), normalize(ref))
        if err:
            print(f"[FAIL] {name}: {err}")
            a, b = normalize(res), normalize(ref)
            print("  ours:", a.head(3).to_dict("records"))
            print("  ref :", b.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"[OK] {name} ({len(res)} rows)")
            n_ok += 1
    # queries without oracle: report presence only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            res = load_result(out_dir, name)
            status = "rows-only" if res is not None and len(res) > 0 else "EMPTY"
            print(f"[{status}] {name} ({0 if res is None else len(res)} rows)")
            n_skip += 1
    print(f"== {n_ok} ok, {n_fail} fail, {n_skip} rows-only, {n_warn} dtype-warn ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
