#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against DuckDB
on the same fixture tables and compares: row count, sorted column names, and
cell values (exact for ints/strings, bit-exact for doubles unless --tol).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.types

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    return [tuple(norm(data[c][i]) for c in cols) for i in range(n)], cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        # The driver's comparator sorts a pandas frame — array/struct-typed
        # cells are unhashable there and fail the query even when values
        # match (r03 q53). Mirror that limitation here, before paying for
        # the oracle execution.
        nested = [f.name for f in got.schema
                  if pyarrow.types.is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: nested-typed output columns {nested} "
                  "(driver comparator cannot hash arrays/structs)")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # r09 q297: DuckDB silently widens SUM(BIGINT) [incl. window SUM]
        # to HUGEINT → arrow decimal128. The driver's typed hash cannot
        # normalize that against Spark's int64 even when every value is
        # equal, so the gate goes red on type alone. Fail HERE, where the
        # fix is a CAST in the oracle, not in the driver's artifact.
        decs = [f.name for f in want.schema
                if pyarrow.types.is_decimal(f.type)]
        if decs:
            print(f"FAIL {name}: oracle emits decimal128 columns {decs} "
                  "(DuckDB HUGEINT widening; CAST(... AS BIGINT) in the "
                  "oracle — the driver's typed hash cannot normalize it)")
            n_fail += 1
            continue
        grows, gcols = rows_of(got)
        wrows, wcols = rows_of(want)
        if gcols != wcols:
            print(f"FAIL {name}: columns spark={gcols} duckdb={wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} duckdb={len(wrows)}")
            n_fail += 1
            continue
        # positional compare first (Verify coalesce(1)s ordered output);
        # sorted-order fallback catches value-equal-but-reordered results,
        # reported as PASS* since the driver's hash sorts rows too.
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, wrows)) if a != b]
        # None-safe sort key: a NULL cell in an otherwise-reordered
        # result must not crash the comparator (None < str TypeError)
        nskey = lambda r: tuple((v is None, str(v)) for v in r)
        if bad and sorted(grows, key=nskey) == sorted(wrows, key=nskey):
            print(f"PASS* {name} ({len(grows)} rows; order differs, values match)")
            n_pass += 1
            continue
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first @{i}:")
            print(f"  cols : {gcols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
