#!/usr/bin/env python3
"""Extend the /tmp sf1 fixture set with the TPC-H-ish tables + events.

`gen_sf1.py` rebuilds `documents`/`embeddings` at sf1 by the driver's
generative process (measured invariants). The r18 sf1 oracle sweep
(VERDICT r17, task 5) also needs the relational tables a few heavy
lanes read (q09: customer/orders/lineitem; q100: orders; q125:
lineitem; q61: events). For those, exact process replication is not
required — the oracle compare is Spark-vs-DuckDB on the SAME parquet —
so this tool scales /root/testdata/sf0.1 by 10× REPLICATION with
consistent key offsets:

  - every copy k shifts each table's primary key by k * (max_key + 1),
    and every foreign key by the SAME offset of its referenced table —
    referential integrity (join fan-outs, group sizes, null structure)
    is preserved exactly; distributions are unchanged by construction;
  - value columns (dates, prices, flags) are kept verbatim: a 10×
    denser instance of the same process, which is what a scale-up
    looks like for these lanes (no dedup/near-dup structure rides on
    these tables — that structure lives in documents/embeddings, which
    gen_sf1.py scales by the measured process instead).

Output: /tmp/testdata_sf1/{region,nation,customer,supplier,part,
orders,lineitem,events}.parquet. LOCAL scale fixture only — never an
oracle input for the driver's gate.
"""
import duckdb
import os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata_sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def max_key(t, col):
    return con.sql(f"SELECT max({col}) FROM {src(t)}").fetchone()[0]


def copy(table, select):
    out = f"{DST}/{table}.parquet"
    con.sql(
        f"COPY ({select}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table:10s} {n:>9,} rows -> {out}")


# tiny dimensions: copied verbatim (region/nation key spaces are fixed
# vocabularies — customer.c_nationkey etc. stay valid against them)
for t in ("region", "nation"):
    copy(t, f"SELECT * FROM {src(t)}")

off_cust = max_key("customer", "c_custkey") + 1
off_supp = max_key("supplier", "s_suppkey") + 1
off_part = max_key("part", "p_partkey") + 1
off_ord = max_key("orders", "o_orderkey") + 1
off_user = con.sql(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
off_evt = con.sql(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]

rep = f"(SELECT unnest(range({K})) AS rep)"

copy("customer", f"""
  SELECT c_custkey + rep * {off_cust} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}, {rep}""")

copy("supplier", f"""
  SELECT s_suppkey + rep * {off_supp} AS s_suppkey, * EXCLUDE (s_suppkey, rep)
  FROM {src('supplier')}, {rep}""")

copy("part", f"""
  SELECT p_partkey + rep * {off_part} AS p_partkey, * EXCLUDE (p_partkey, rep)
  FROM {src('part')}, {rep}""")

copy("orders", f"""
  SELECT o_orderkey + rep * {off_ord} AS o_orderkey,
         o_custkey + rep * {off_cust} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {rep}""")

copy("lineitem", f"""
  SELECT l_orderkey + rep * {off_ord} AS l_orderkey,
         l_partkey + rep * {off_part} AS l_partkey,
         l_suppkey + rep * {off_supp} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {rep}""")

copy("events", f"""
  SELECT event_id + rep * {off_evt} AS event_id, ts,
         user_id + rep * {off_user} AS user_id,
         event_type, value, props
  FROM {src('events')}, {rep}""")
