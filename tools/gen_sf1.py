#!/usr/bin/env python3
"""Generate /tmp/sf1 = 10x replication of /root/testdata/sf0.1.

Recipe (matches the round-14 sf1 artifact's description):
- every fact-table key column is offset per copy by i * OFF where OFF is
  a multiple of 25200 (= 2^4*3^2*5^2*7) strictly greater than the max key,
  so every `key % m` fixture class with m | 25200 survives replication
  and joined tables (orders<->lineitem on orderkey, customer<->orders on
  custkey, ...) stay consistent within a copy;
- dimension tables (region, nation) are NOT replicated;
- documents.text is salted with a PER-ROW suffix token (' s<final id>')
  so corpus-uniqueness assumptions hold globally: the sf0.1 base table
  itself contains a latent normalized-text collision (doc 179 vs 2523 —
  invisible at the sf0.01 gate, which has no doc 2523) that would break
  the closed-form dedup oracles (q115/q127) at any replication factor;
  n_chars is recomputed to match the salted text.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir]
"""
import duckdb, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
os.makedirs(DST, exist_ok=True)

# per-key-space offsets: smallest multiple of 25200 > max key at sf0.1
OFF = {
    "custkey": 25200,    # max 14999
    "suppkey": 25200,    # max 999
    "partkey": 25200,    # max 19999
    "orderkey": 151200,  # max 149999 (25200*6)
    "event_id": 100800,  # max 99999 (25200*4)
    "user_id": 25200,    # max 1499
    "doc_id": 25200,     # max 4999
    "vec_id": 25200,     # max 1999
}

con = duckdb.connect()
con.execute("SET threads TO 16")

def rep(table, select_expr):
    """Union of 10 offset copies; `select_expr` may reference i."""
    parts = [f"SELECT {select_expr.format(i=i)} FROM src" for i in range(10)]
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(table, n)

# dims: single copy
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "dim copy")

rep("customer",
    f"c_custkey + {{i}}*{OFF['custkey']} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
rep("supplier",
    f"s_suppkey + {{i}}*{OFF['suppkey']} AS s_suppkey, s_name, s_nationkey, s_acctbal")
rep("part",
    f"p_partkey + {{i}}*{OFF['partkey']} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
rep("orders",
    f"o_orderkey + {{i}}*{OFF['orderkey']} AS o_orderkey, o_custkey + {{i}}*{OFF['custkey']} AS o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
rep("lineitem",
    f"l_orderkey + {{i}}*{OFF['orderkey']} AS l_orderkey, l_partkey + {{i}}*{OFF['partkey']} AS l_partkey, "
    f"l_suppkey + {{i}}*{OFF['suppkey']} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
rep("events",
    f"event_id + {{i}}*{OFF['event_id']} AS event_id, ts, user_id + {{i}}*{OFF['user_id']} AS user_id, "
    f"event_type, value, props")
rep("documents",
    f"doc_id + {{i}}*{OFF['doc_id']} AS doc_id, "
    f"text || ' s' || CAST(doc_id + {{i}}*{OFF['doc_id']} AS VARCHAR) AS text, "
    f"lang, source, "
    # keep the length column consistent with the salted text
    f"n_chars + 2 + length(CAST(doc_id + {{i}}*{OFF['doc_id']} AS VARCHAR)) AS n_chars")
# embeddings: copies 1-9 EXCLUDE the PQ/IVF-PQ probe vectors (vec_id < 10)
# — an exact replica of a probe quantizes to the probe's own argmin codes,
# so it ties the planted zero-distance copies those fixtures' recall gates
# assume are unique (q150/q154 read recall 0.40 from the tie scramble, an
# artifact of replication, not of the operator). Everything else stays an
# exact copy so the near-dup pair structure the dedup fixtures exercise
# survives. 19,910 rows instead of 20,000.
con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/embeddings.parquet'")
emb_parts = [
    f"SELECT vec_id + {i}*{OFF['vec_id']} AS vec_id, embedding, label FROM src" +
    ("" if i == 0 else " WHERE vec_id >= 10")
    for i in range(10)]
con.execute(f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
print("embeddings",
      con.execute(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0])
print("done ->", DST)
