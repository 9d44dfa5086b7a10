#!/usr/bin/env python3
"""Dedup-composition rung (round-10 verdict task 7): a COPIES-x
documents corpus with BOTH exact- and near-duplicate structure, for
measuring the documented 100 TB composition (exact dedup FIRST, fuzzy
matching on survivors) against naive fuzzy-on-everything.

Each sf0.1 document becomes COPIES copies in COPIES/5 near-variant
groups of 5 EXACT copies each (copies 5k..5k+4 share the same ' v<k>'
suffix; group 0 keeps the original text). Exact dedup (q24/q77's md5
stage) collapses 5x before the blocked fuzzy join, so candidate pairs
drop ~25x — the measurement behind the q25/q196 ladder finding's
composition answer. COPIES=10 keeps naive fuzzy feasible for a direct
A/B; COPIES=100 is the rung where naive is pair-count-infeasible and
only the composition survives.

Usage: GRAFT_DEDUP_COPIES=100 python3 tools/gen_dedup_rung.py [outdir]
       (default COPIES=100, outdir /dev/shm/graft-dedup100)
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("GRAFT_DEDUP_COPIES", "100"))
OUT = sys.argv[1] if len(sys.argv) > 1 else f"/dev/shm/graft-dedup{COPIES}"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE VIEW t AS SELECT * FROM '{SRC}/documents.parquet'")
K = con.sql("SELECT max(doc_id)+1 FROM t").fetchone()[0]
con.sql(f"""COPY (
    SELECT doc_id + i*{K} AS doc_id,
           CASE WHEN i//5 = 0 THEN text ELSE text || ' v' || (i//5) END AS text,
           lang, source,
           CASE WHEN i//5 = 0 THEN n_chars
                ELSE n_chars + 2 + len(CAST(i//5 AS VARCHAR)) END AS n_chars
    FROM t, range({COPIES}) r(i))
    TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*), count(DISTINCT text) FROM '{OUT}/documents.parquet'").fetchone()
print(f"documents: {n[0]} rows, {n[1]} distinct texts -> {OUT}")
# Candidate-pair accounting under q196's (lang, first-token) blocking:
# naive = pairs over all docs; composed = pairs over distinct texts.
q = """SELECT sum(n*(n-1)//2) FROM (
         SELECT lang, split_part(text, ' ', 1) AS t1, count(*) AS n
         FROM {src} GROUP BY 1, 2)"""
naive = con.sql(q.format(src=f"'{OUT}/documents.parquet'")).fetchone()[0]
comp = con.sql(q.format(
    src=f"(SELECT min(lang) AS lang, text FROM '{OUT}/documents.parquet' GROUP BY text)"
)).fetchone()[0]
print(f"candidate pairs  naive: {naive:,}  composed(distinct-text): {comp:,}  "
      f"ratio {naive/comp:.1f}x")
