#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--audit]

--audit skips the compare and emits one JSON line per query (rows,
Spark schema DDL, oracle DESCRIBE types) from the Verify dumps — a
diffable per-round record.

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

# Queries whose EMPTY result at the verify SF is semantically correct and
# oracle-confirmed (the fixture genuinely contains no qualifying rows).
# Everything else: 0 rows FAILS even when the oracle also returns 0 —
# empty == empty hashes green in the driver, which is exactly how
# dedup_embedding_lsh_wide's dead 12-bit pin stayed green for a round.
# Adding a name here requires a comment saying WHY emptiness is correct.
EMPTY_OK: set = set()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def duck_types(con, sql):
    """Column-name → DuckDB type for a query, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


# The driver's hash tolerates width differences WITHIN the signed-int
# family (21 green r12 queries emit Spark INT where the oracle emits
# BIGINT) and within the binary-float family, but NOT representation
# changes: DuckDB HUGEINT (an uncast sum(BIGINT)) pandas-coerces to
# float64/object and hash-failed multimodal_video_frames in r12 even
# though every value matched. Classes below encode exactly that
# observed tolerance; anything unlisted must match verbatim.
_TYPE_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "FLOAT": "float", "DOUBLE": "float",
}


def type_mismatches(con, name, out_dir, oracle_sql):
    """The driver's hash compare is representation-sensitive (DuckDB
    HUGEINT vs Spark LONG hash-fails even when every value matches —
    the r12 multimodal_video_frames bug). pandas fetchdf() coerces both
    to int64 and masks it, so the value diff below can't catch this
    class. Compare DESCRIBE types of the Spark parquet output vs the
    oracle SQL directly instead, modulo the driver's observed
    same-class tolerance."""
    got_t = duck_types(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    want_t = duck_types(con, f"({oracle_sql})")
    bad = []
    for c in sorted(set(got_t) & set(want_t)):
        g, w = got_t[c], want_t[c]
        if _TYPE_CLASS.get(g, g) != _TYPE_CLASS.get(w, w):
            bad.append((c, g, w))
    # a column present on only one side would otherwise bypass the type
    # gate entirely (the later column-name diff reports the rename but
    # hides a coincident type change) — surface it here with its type
    for c in sorted(set(got_t) - set(want_t)):
        bad.append((c, got_t[c], "<absent in oracle>"))
    for c in sorted(set(want_t) - set(got_t)):
        bad.append((c, "<absent in spark output>", want_t[c]))
    return bad


def audit(con, out_dir, oracles, names):
    """One JSON line per query — rows, Spark schema DDL (from Verify's
    spark_schema.json dump), and the oracle's DESCRIBE types — a single
    diffable record future rounds (and judges) can compare without
    re-running anything."""
    import os

    schemas = {}
    p = f"{out_dir}/spark_schema.json"
    if os.path.exists(p):
        with open(p) as f:
            schemas = json.load(f)
    rows = {}
    p = f"{out_dir}/rowcounts.json"
    if os.path.exists(p):
        with open(p) as f:
            rows = {k: int(v) for k, v in json.load(f).items()}
    for name in names:
        if name not in rows:
            rows[name] = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
        rec = {"query": name, "rows": rows[name]}
        if name in schemas:
            rec["spark_schema"] = schemas[name]
        if name in oracles:
            try:
                rec["oracle_types"] = duck_types(con, f"({oracles[name]})")
            except Exception as e:
                rec["oracle_types"] = f"ERROR: {e}"
        print(json.dumps(rec, sort_keys=True))


def main(sf_dir, out_dir, mode=""):
    import os as _os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single files; ScaleGen (data-sf1,
        # data-sf10) writes Spark directories named <t>.parquet
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if _os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    import os

    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)
    )
    if mode == "--audit":
        audit(con, out_dir, oracles, names)
        return 0
    n_pass = n_fail = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchdf()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else ""))
            continue
        if len(got) == 0 and name not in EMPTY_OK:
            # fail BEFORE the value compare: an empty Spark result vs an
            # empty oracle result is a vacuous green
            print(f"[FAIL] {name}: 0 rows (vacuous — not in EMPTY_OK allowlist)")
            n_fail += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        tbad = type_mismatches(con, name, out_dir, oracles[name])
        if tbad:
            cols = ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in tbad)
            print(f"[FAIL] {name}: TYPE mismatch ({cols})")
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
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else ""))
