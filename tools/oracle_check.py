#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir parquet
tables registered by name, then compares: column names (sorted),
row counts, and a hash over values with columns sorted by name and
rows sorted. Floats are compared both exactly and with tolerance so
we can see how close a near-miss is.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        # normalize dtypes: datetimes to ns, ints to int64
        for c in g.columns:
            if str(g[c].dtype).startswith("datetime") or str(w[c].dtype).startswith("datetime"):
                g[c] = pd.to_datetime(g[c])
                w[c] = pd.to_datetime(w[c])
            if str(g[c].dtype).startswith("int") and str(w[c].dtype).startswith("int"):
                g[c] = g[c].astype("int64")
                w[c] = w[c].astype("int64")
        hg, hw = table_hash(g), table_hash(w)
        if hg == hw:
            print(f"PASS {name} ({len(g)} rows)")
            continue
        # exact hash mismatch — find how far off
        max_diff = 0.0
        bad_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" and b.dtype.kind == "f":
                d = (a - b).abs()
                rel = d / b.abs().clip(lower=1e-300)
                m = rel.max(skipna=True)
                nan_mismatch = (a.isna() != b.isna()).sum()
                if (m and m > 0) or nan_mismatch:
                    bad_cols.append((c, float(m or 0), int(nan_mismatch)))
                    max_diff = max(max_diff, float(m or 0))
            else:
                neq = (a.astype(str) != b.astype(str)).sum()
                if neq:
                    bad_cols.append((c, f"{neq} unequal", 0))
        if bad_cols and all(isinstance(x[1], float) and x[1] < 1e-9 and x[2] == 0 for x in bad_cols):
            print(f"NEAR {name}: float-only mismatch, max rel diff {max_diff:.2e} — cols {[(c, f'{m:.1e}') for c, m, _ in bad_cols]}")
        else:
            print(f"FAIL {name}: value mismatch — {bad_cols[:5]}")
        failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
