#!/usr/bin/env python3
"""Self-test for check.py's non-vacuity guard: a deliberately emptied
query whose oracle is ALSO empty must FAIL (the driver's hash compare
passes empty == empty, which is how a dead query parameterization can
stay green for a round), and the same query with rows must pass.

Usage: python3 tools/test_check_guard.py [sfDir=/root/testdata/sf0.001]
"""
import json
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
import check  # noqa: E402


def write_case(out_dir, rows):
    os.makedirs(f"{out_dir}/guard_case")
    con = duckdb.connect()
    where = "" if rows else " WHERE 1 = 0"
    con.execute(
        f"COPY (SELECT CAST(1 AS BIGINT) AS x{where}) TO "
        f"'{out_dir}/guard_case/part-0.parquet' (FORMAT PARQUET)"
    )
    with open(f"{out_dir}/oracle_sql.json", "w") as f:
        json.dump({"guard_case": f"SELECT CAST(1 AS BIGINT) AS x{where}"}, f)


def main(sf_dir):
    with tempfile.TemporaryDirectory() as d:
        write_case(f"{d}/empty", rows=False)
        rc_empty = check.main(sf_dir, f"{d}/empty")
        write_case(f"{d}/full", rows=True)
        rc_full = check.main(sf_dir, f"{d}/full")
    assert rc_empty == 1, "guard MISSED the vacuous empty==empty case"
    assert rc_full == 0, "guard false-positived on a non-empty result"
    print("guard self-test: PASS (empty==empty fails, non-empty passes)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
