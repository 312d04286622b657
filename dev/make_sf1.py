#!/usr/bin/env python3
"""Deterministic ~sf1 blow-up of /root/testdata/sf0.1 for the scale-slope
bench (VERDICT r10 Next #1): 10 key-shifted copies of every scaling
table, written as single parquet files in the driver's layout
(<dir>/<table>.parquet) so Bench/BenchConcurrent run against it
unchanged via SPARK_GRAFT_SF_DIR.

Shifts keep referential integrity (orders.o_custkey shifts with
customer.c_custkey etc.) and documents get a per-copy suffix token so
the corpus is 10x distinct documents, not 10 identical copies (which
would make every dedup row degenerate). region/nation are fixed-size in
TPC-H and are copied as-is.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SH = 10_000_000  # key shift per copy: far above any sf0.1 key range

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count()}")


def blow_up(table, select_tpl):
    parts = " UNION ALL ".join(
        select_tpl.format(c=c, sh=c * SH) for c in range(COPIES))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


for t in ("region", "nation"):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied as-is")

blow_up("customer", f"""
  SELECT c_custkey + {{sh}} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet')""")

blow_up("supplier", f"""
  SELECT s_suppkey + {{sh}} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet')""")

blow_up("part", f"""
  SELECT p_partkey + {{sh}} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM read_parquet('{SRC}/part.parquet')""")

blow_up("orders", f"""
  SELECT o_orderkey + {{sh}} AS o_orderkey, o_custkey + {{sh}} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet')""")

blow_up("lineitem", f"""
  SELECT l_orderkey + {{sh}} AS l_orderkey, l_partkey + {{sh}} AS l_partkey,
         l_suppkey + {{sh}} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet')""")

blow_up("events", f"""
  SELECT event_id + {{sh}} AS event_id, ts, user_id + {{sh}} AS user_id,
         event_type, value, props
  FROM read_parquet('{SRC}/events.parquet')""")

# distinct text per copy: append a copy token (and keep n_chars honest)
blow_up("documents", f"""
  SELECT doc_id + {{sh}} AS doc_id,
         CASE WHEN {{c}} = 0 THEN text ELSE text || ' copytok{{c}}' END AS text,
         lang, source,
         CASE WHEN {{c}} = 0 THEN n_chars
              ELSE n_chars + length(' copytok{{c}}') END AS n_chars
  FROM read_parquet('{SRC}/documents.parquet')""")

blow_up("embeddings", f"""
  SELECT vec_id + {{sh}} AS vec_id, embedding, label
  FROM read_parquet('{SRC}/embeddings.parquet')""")

print("done ->", DST)
