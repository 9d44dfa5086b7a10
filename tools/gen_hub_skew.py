#!/usr/bin/env python3
"""Hub-key skew rung for the scale ladder (round-10 verdict task 5).

The sf0.1→sf1 ladder holds per-user density constant — exactly the
axis the per-key-window family (q211/q217/q231/q168/q236) partitions
on, and the axis q166 partitions on for documents (lang). This tool
builds two SAME-VOLUME variants that differ only in key skew:

  <out>/hub:     sf0.1 events + 1,000,000 extra events ALL on user 0
                 (the 1M-event hub user), documents with ONE language.
  <out>/uniform: the SAME 1M extra events spread over 15,000 fresh
                 users (~67 each — sf0.1's density), documents with
                 the original 5 languages, 10x-copied to match rows.

Extra events clone event_type/value/props from the originals
(row k clones row k mod 100k), timestamps spread evenly over the same
January-2024 span, event_ids fresh — so the two variants are
row-for-row identical except user_id. A per-key-window query whose
cost is O(n log n) per key shows hub ≈ uniform wall time; a quadratic
frame shows hub >> uniform (the q211 pre-rewrite hazard).

Usage: python3 tools/gen_hub_skew.py [outdir]   (default /dev/shm/graft-skew)
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/graft-skew"
EXTRA = 1_000_000
UNI_USERS = 15_000

con = duckdb.connect()
for t in ["events", "documents"]:
    con.sql(f"CREATE VIEW t_{t} AS SELECT * FROM '{SRC}/{t}.parquet'")

base_n = con.sql("SELECT count(*) FROM t_events").fetchone()[0]
max_id = con.sql("SELECT max(event_id) FROM t_events").fetchone()[0]
max_uid = con.sql("SELECT max(user_id) FROM t_events").fetchone()[0]

def extra_events(user_expr: str) -> str:
    # row k clones the columns of original row (k mod base_n); the
    # even timestamp spread keeps per-user event-time order total
    return f"""
      WITH numbered AS (
        SELECT row_number() OVER (ORDER BY event_id) - 1 AS rk, event_type,
               value, props
        FROM t_events),
      k AS (SELECT range AS k FROM range({EXTRA}))
      SELECT {max_id} + 1 + k.k AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (k.k * 2500) MILLISECOND AS ts,
             {user_expr} AS user_id,
             n.event_type, n.value, n.props
      FROM k JOIN numbered n ON n.rk = k.k % {base_n}"""

for name, user_expr, docs_sql in [
    ("hub", "CAST(0 AS BIGINT)",
     "SELECT doc_id, text, 'xx' AS lang, source, n_chars, i FROM t_documents, range(10) r(i)"),
    ("uniform", f"{max_uid} + 1 + k.k % {UNI_USERS}",
     "SELECT doc_id, text, lang, source, n_chars, i FROM t_documents, range(10) r(i)"),
]:
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    con.sql(f"""COPY ((SELECT * FROM t_events) UNION ALL ({extra_events(user_expr)}))
                TO '{d}/events.parquet' (FORMAT PARQUET)""")
    # documents: 10 copies (doc_id re-keyed) so both variants have 50k docs
    con.sql(f"""COPY (
        SELECT doc_id + i*100000 AS doc_id, text, lang, source, n_chars
        FROM ({docs_sql}) q(doc_id, text, lang, source, n_chars, i))
        TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    # remaining tables pass through unchanged (symlinks keep this cheap)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"]:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    ne = con.sql(f"SELECT count(*), max(cnt) FROM (SELECT user_id, count(*) cnt "
                 f"FROM '{d}/events.parquet' GROUP BY 1)").fetchone()
    print(f"{name}: users={ne[0]} max_events_per_user={ne[1]}")
print(f"done -> {OUT}")
