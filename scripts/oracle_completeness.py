#!/usr/bin/env python3
"""Completeness probe for the prefix-filtered near-dup oracles.

The near-dup oracles (q26/q41/q50/q83/q96/q114) generate candidate pairs
with prefix filtering (rare-first order, prefix length |s|-ceil(0.6|s|)+1,
5*min >= 3*max length bound), which is provably complete for Jaccard >= 0.6.
This script cross-checks that proof empirically: it brute-forces ALL pairs
within a stratified corpus subsample (every STRIDE-th corpus id) and asserts
every brute-verified pair appears in the prefix-filtered oracle pair stream.

Usage: python3 scripts/oracle_completeness.py <sfDir> [stride]
Exit 0 and "COMPLETE" on success; exit 1 with the missing pairs otherwise.
"""
import sys

import duckdb

PREFIX_CTES = r"""
corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000, regexp_replace(text, ' \S+$', '')
  FROM documents WHERE doc_id % 7 = 0),
toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
       FROM toks WHERE len(w) >= 3),
tok2 AS MATERIALIZED (SELECT doc_id, unnest(s) AS t FROM sh),
freq AS MATERIALIZED (SELECT t, COUNT(*) AS f FROM tok2 GROUP BY t),
sorted AS MATERIALIZED (
  SELECT doc_id, list(t ORDER BY f, t) AS st, COUNT(*) AS n
  FROM tok2 JOIN freq USING (t) GROUP BY doc_id),
pref AS MATERIALIZED (
  SELECT doc_id, n,
         unnest(list_slice(st, 1, n - (3*n + 4)//5 + 1)) AS pt
  FROM sorted),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.pt = b.pt AND a.doc_id < b.doc_id
  WHERE 5 * b.n >= 3 * a.n AND 5 * a.n >= 3 * b.n),
pairs AS MATERIALIZED (
  SELECT id_a, id_b,
         len(list_intersect(sa.st, sb.st)) AS inter,
         len(list_distinct(list_concat(sa.st, sb.st))) AS uni
  FROM cand JOIN sorted sa ON sa.doc_id = cand.id_a
            JOIN sorted sb ON sb.doc_id = cand.id_b
  WHERE 5 * len(list_intersect(sa.st, sb.st))
        >= 3 * len(list_distinct(list_concat(sa.st, sb.st))))
"""


def main():
    sf_dir = sys.argv[1]
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")

    oracle_pairs = set(map(tuple, con.execute(
        f"WITH {PREFIX_CTES} SELECT id_a, id_b FROM pairs").fetchall()))

    brute = con.execute(f"""
        WITH {PREFIX_CTES},
        sample AS (SELECT doc_id, st FROM sorted
                   WHERE (doc_id % 200000) % {stride} = 0),
        bp AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sample a JOIN sample b ON a.doc_id < b.doc_id
          WHERE 5 * len(list_intersect(a.st, b.st))
                >= 3 * len(list_distinct(list_concat(a.st, b.st))))
        SELECT id_a, id_b FROM bp""").fetchall()
    brute_pairs = set(map(tuple, brute))

    missing = brute_pairs - oracle_pairs
    print(f"oracle pairs: {len(oracle_pairs)}; "
          f"brute subsample pairs (stride {stride}): {len(brute_pairs)}; "
          f"missing from oracle: {len(missing)}")
    if missing:
        for p in sorted(missing)[:20]:
            print(f"  MISSING {p}")
        print("INCOMPLETE")
        sys.exit(1)
    print("COMPLETE")


if __name__ == "__main__":
    main()
