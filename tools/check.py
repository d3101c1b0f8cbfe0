#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables,
sorts columns by name and rows by all columns, and diffs values. Reports
exact mismatches and max float deltas (to surface precision hazards
before the driver's hash compare does).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    import os

    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)
    )
    n_pass = n_fail = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchdf()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else ""))
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = None
        max_fdelta = 0.0
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                for x, y in zip(a, b):
                    if (isinstance(x, float) and math.isnan(x)) and (
                        isinstance(y, float) and math.isnan(y)
                    ):
                        continue
                    if x is None and y is None:
                        continue
                    d = abs(float(x) - float(y))
                    max_fdelta = max(max_fdelta, d)
                    if d > 0:
                        bad = bad or (c, x, y)
            else:
                neq = (a != b) & ~(a.isna() & b.isna())
                if neq.any():
                    i = neq.idxmax()
                    bad = (c, a[i], b[i])
                    break
        if bad and max_fdelta == 0:
            print(f"[FAIL] {name}: col {bad[0]}: got {bad[1]!r} want {bad[2]!r}")
            n_fail += 1
        elif max_fdelta > 0:
            # the driver's compare is an exact hash — ANY float delta fails
            print(f"[FAIL] {name}: max float delta {max_fdelta} (col {bad[0]}: got {bad[1]!r} want {bad[2]!r})")
            n_fail += 1
        else:
            print(f"[ok] {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
