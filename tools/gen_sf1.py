#!/usr/bin/env python3
"""Generate a local sf1 dataset (~10x sf0.1) for the scale probe.

/root/testdata is read-only and the driver ships no sf1, so the probe
builds one from sf0.1: 10 copies with consistently OFFSET keys (FK
integrity preserved: lineitem->orders->customer, lineitem->part/
supplier) and per-copy content perturbation chosen so the WORKLOAD
scales linearly — i.e. the copy trick must not plant cross-copy
near-duplicates that would quadratically inflate the similarity
operators and masquerade as super-linear scaling:

- documents: text copied VERBATIM across copies — clone groups of a
  constant 10 docs. Each doc gains exactly 9 true duplicates, so the
  near/exact-dup pair population grows LINEARLY (45 pairs per group),
  which is both the realistic shape (cross-source duplication is what
  dedup engines exist for) and a clean scaling signal. (A first
  attempt inserted a per-copy marker token between words instead;
  that token had df = |copy| — an adversarial stop-token that
  quadratically inflated the similarity joins and polluted the probe.)
- embeddings: copy c rotates the vector by c positions — norm
  preserved, direction genuinely different, no planted clone groups.
- events: ids offset; ts written as TIMESTAMP_NS to match the
  driver's TIMESTAMP(NANOS) parquet encoding (the streaming queries
  read the raw long under nanosAsLong=true).
- orders/lineitem/...: ids offset by copy, payloads unchanged.
- region/nation: fixed dimensions, copied as-is.

Output: one parquet per table under the target dir (same layout the
driver uses). Deterministic — no RNG anywhere.

Usage: gen_sf1.py [outDir=/root/repo/target/sf1] [copies=10]
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def bound(table, col):
    return con.execute(f"SELECT max({col}) + 1 FROM {src(table)}").fetchone()[0]

C = bound("customer", "c_custkey")
O = bound("orders", "o_orderkey")
P = bound("part", "p_partkey")
S = bound("supplier", "s_suppkey")
E = bound("events", "event_id")
U = bound("events", "user_id")
D = bound("documents", "doc_id")
V = bound("embeddings", "vec_id")

def gen(table, select_for_copy):
    parts = " UNION ALL ".join(select_for_copy(c) for c in range(COPIES))
    dest = f"{OUT}/{table}.parquet"
    con.execute(f"COPY ({parts}) TO '{dest}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
    print(f"{table}: {n} rows")

os.makedirs(OUT, exist_ok=True)

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("customer", lambda c: f"""
  SELECT c_custkey + {c * C} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {src('customer')}""")

gen("supplier", lambda c: f"""
  SELECT s_suppkey + {c * S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}""")

gen("part", lambda c: f"""
  SELECT p_partkey + {c * P} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {src('part')}""")

gen("orders", lambda c: f"""
  SELECT o_orderkey + {c * O} AS o_orderkey, o_custkey + {c * C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

gen("lineitem", lambda c: f"""
  SELECT l_orderkey + {c * O} AS l_orderkey, l_partkey + {c * P} AS l_partkey,
         l_suppkey + {c * S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src('lineitem')}""")

gen("events", lambda c: f"""
  SELECT event_id + {c * E} AS event_id, ts::TIMESTAMP_NS AS ts,
         user_id + {c * U} AS user_id, event_type, value, props
  FROM {src('events')}""")

# DuckDB's parquet writer downcasts TIMESTAMP_NS to MICROS; the driver
# files are TIMESTAMP(NANOS) and the streaming queries read the raw
# long under nanosAsLong=true — rewrite with pyarrow to keep ns.
import pyarrow as pa
import pyarrow.parquet as pq
tbl = pq.read_table(f"{OUT}/events.parquet")
idx = tbl.schema.get_field_index("ts")
tbl = tbl.set_column(idx, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
pq.write_table(tbl, f"{OUT}/events.parquet", version="2.6", coerce_timestamps=None)
print("events: ts rewritten as TIMESTAMP(NANOS)")

gen("documents", lambda c: f"""
  SELECT doc_id + {c * D} AS doc_id, text, lang, source, n_chars
  FROM {src('documents')}""")

gen("embeddings", lambda c: (
    f"SELECT vec_id, embedding, label FROM {src('embeddings')}"
    if c == 0 else f"""
  SELECT vec_id + {c * V} AS vec_id,
         list_concat(embedding[{c + 1}:], embedding[1:{c}])::FLOAT[] AS embedding,
         label
  FROM {src('embeddings')}"""))

print(f"done -> {OUT}")
