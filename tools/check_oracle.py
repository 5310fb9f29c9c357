#!/usr/bin/env python3
"""Local t2 parity harness (dev-only; mirrors the driver's DuckDB oracle).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares against the Spark parquet dumped by `graft.Verify`. Columns are
sorted by name (as the driver does); rows compared in order; floats must be
bit-equal (NaN==NaN allowed).
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def normalize(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        # unify datetime-ish / date representations for comparison
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s):
            head = s.iloc[0]
            if hasattr(head, "isoformat"):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            elif hasattr(head, "__len__") and not isinstance(head, (str, bytes)):
                # array cells (list/ndarray) -> tuples so == compares by value
                df[c] = s.map(lambda v: tuple(v) if v is not None else None)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(sqls):
        try:
            oracle = normalize(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = normalize(got)
        if list(got.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(oracle.columns)}")
            n_fail += 1
            continue
        if got.shape != oracle.shape:
            print(f"FAIL {name}: shape {got.shape} != {oracle.shape}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], oracle[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}[row {i}]: spark={a[i]!r} oracle={b[i]!r} "
                           f"(dtypes {a.dtype}/{b.dtype}, {int((~eq).sum())} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({got.shape[0]} rows, {got.shape[1]} cols)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
