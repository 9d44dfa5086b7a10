#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset from sf0.1 for the scale-ladder
audit (ARCHITECTURE.md "Scale ladder"): 10 key-shifted copies of every
fact table, dims unchanged. Key shifts keep referential integrity
(orders.o_custkey shifts with customer.c_custkey, lineitem's three FKs
shift with their parents), event timestamps are NOT shifted (10x users
over the same time span - per-user density unchanged, which is what a
bigger deployment looks like), and each document copy gets a one-token
suffix so the corpus is 10x near-duplicate-rich rather than 10x
exact-duplicate-rich (the harsher but realistic dedup stress).

Usage: python3 tools/gen_scale_ladder.py [outdir]  (default /dev/shm/graft-sf1)
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/graft-sf1"
COPIES = int(os.environ.get("GRAFT_LADDER_COPIES", "10"))

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def shift(table):
    return con.sql(
        f"SELECT COALESCE(max({table[0]}), 0) + 1 FROM t_{table[1]}"
    ).fetchone()[0]

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW t_{t} AS SELECT * FROM '{SRC}/{t}.parquet'")

K = {  # key stride per shifted id column
    "c": con.sql("SELECT max(c_custkey)+1 FROM t_customer").fetchone()[0],
    "s": con.sql("SELECT max(s_suppkey)+1 FROM t_supplier").fetchone()[0],
    "p": con.sql("SELECT max(p_partkey)+1 FROM t_part").fetchone()[0],
    "o": con.sql("SELECT max(o_orderkey)+1 FROM t_orders").fetchone()[0],
    "e": con.sql("SELECT max(event_id)+1 FROM t_events").fetchone()[0],
    "u": con.sql("SELECT max(user_id)+1 FROM t_events").fetchone()[0],
    "d": con.sql("SELECT max(doc_id)+1 FROM t_documents").fetchone()[0],
    "v": con.sql("SELECT max(vec_id)+1 FROM t_embeddings").fetchone()[0],
}

SQL = {
    "region": "SELECT * FROM t_region",
    "nation": "SELECT * FROM t_nation",
    "customer": f"""SELECT c_custkey + i*{K['c']} AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment FROM t_customer, range({COPIES}) r(i)""",
    "supplier": f"""SELECT s_suppkey + i*{K['s']} AS s_suppkey, s_name,
        s_nationkey, s_acctbal FROM t_supplier, range({COPIES}) r(i)""",
    "part": f"""SELECT p_partkey + i*{K['p']} AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice FROM t_part, range({COPIES}) r(i)""",
    "orders": f"""SELECT o_orderkey + i*{K['o']} AS o_orderkey,
        o_custkey + i*{K['c']} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority FROM t_orders, range({COPIES}) r(i)""",
    "lineitem": f"""SELECT l_orderkey + i*{K['o']} AS l_orderkey,
        l_partkey + i*{K['p']} AS l_partkey, l_suppkey + i*{K['s']} AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate FROM t_lineitem, range({COPIES}) r(i)""",
    "events": f"""SELECT event_id + i*{K['e']} AS event_id, ts,
        user_id + i*{K['u']} AS user_id, event_type, value, props
        FROM t_events, range({COPIES}) r(i)""",
    "documents": f"""SELECT doc_id + i*{K['d']} AS doc_id,
        CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text,
        lang, source,
        CASE WHEN i = 0 THEN n_chars ELSE n_chars + 2 + len(CAST(i AS VARCHAR)) END AS n_chars
        FROM t_documents, range({COPIES}) r(i)""",
    "embeddings": f"""SELECT vec_id + i*{K['v']} AS vec_id, embedding, label
        FROM t_embeddings, range({COPIES}) r(i)""",
}

for t, q in SQL.items():
    con.sql(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"done -> {OUT}")
