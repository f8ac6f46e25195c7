#!/usr/bin/env python3
"""Builder tooling only (like verify_local.py): synthesize an sf1 dataset
(10x sf0.1) for the LOCAL scaling self-measurement the round-12 verdict
asked for ("run the bench once at sf1 ... chase any query whose time grows
faster than ~10x"). The driver provides no sf1 testdata, so this scales
up /root/testdata/sf0.1 by replication with key remapping. NOT used by any
gated query or spec — correctness gates stay on driver testdata.

Design (kept deliberately structure-preserving so per-query cost should
scale ~linearly if the PLAN is linear):
- region/nation stay fixed (TPC-H semantics: constant dims).
- every other table gets 10 copies; copy i offsets each key by i*count,
  so FK joins stay consistent within a copy and fan-outs per key are
  UNCHANGED (a join that produced k rows/key still produces k rows/key).
- documents: copy i>0 suffixes every word with 'x<i>' so cross-copy
  shingle Jaccard is ~0 — replicating text verbatim would hand every doc
  9 artificial near-duplicates and blow up all dedup candidate sets
  quadratically for a reason that has nothing to do with plan quality.
  Within-copy near-dup structure is preserved exactly (the same rewrite
  is applied to every doc in the copy).
- embeddings: copy i flips the sign of a per-copy pseudo-random subset of
  dimensions. Within-copy dot products are EXACTLY preserved (s_j^2 = 1),
  cross-copy similarities become incoherent — same rationale as documents.

Output: /tmp/graft_sf1/<table>.parquet (single file each, same layout as
driver testdata).
"""
import duckdb, numpy as np, os, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 100 -> sf10
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def copy_fixed(t):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

def replicate(t, sql_for_copy):
    """sql_for_copy(i) -> a SELECT producing copy i; UNION ALL over copies."""
    union = " UNION ALL ".join(sql_for_copy(i) for i in range(COPIES))
    con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

copy_fixed("region"); copy_fixed("nation")
print("region/nation: fixed")

C, S, P, O, E, U, D = 15000, 1000, 20000, 150000, 100000, 1500, 5000

replicate("customer", lambda i: f"""
  SELECT c_custkey + {i*C} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment FROM '{SRC}/customer.parquet'""")
replicate("supplier", lambda i: f"""
  SELECT s_suppkey + {i*S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")
replicate("part", lambda i: f"""
  SELECT p_partkey + {i*P} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice FROM '{SRC}/part.parquet'""")
replicate("orders", lambda i: f"""
  SELECT o_orderkey + {i*O} AS o_orderkey, o_custkey + {i*C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")
replicate("lineitem", lambda i: f"""
  SELECT l_orderkey + {i*O} AS l_orderkey, l_partkey + {i*P} AS l_partkey,
         l_suppkey + {i*S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate FROM '{SRC}/lineitem.parquet'""")
replicate("events", lambda i: f"""
  SELECT event_id + {i*E} AS event_id, ts, user_id + {i*U} AS user_id,
         event_type, value, props FROM '{SRC}/events.parquet'""")

def doc_copy(i):
    if i == 0:
        return f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'"
    return f"""
      SELECT doc_id + {i*D} AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
                                            w -> w || 'x{i}'), ' ') AS text,
             lang, source,
             CAST(length(array_to_string(list_transform(string_split(text, ' '),
                  w -> w || 'x{i}'), ' ')) AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet'"""
replicate("documents", doc_copy)

# embeddings: numpy sign-flip per copy (duckdb lambdas lack an index arg)
tbl = pq.read_table(f"{SRC}/embeddings.parquet")
vec = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)  # (N, 64)
vid = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
lab = np.array(tbl.column("label").to_pylist(), dtype=np.int32)
N, dim = vec.shape
rng_tables = []
for i in range(COPIES):
    if i == 0:
        v = vec
    else:
        rs = np.random.RandomState(42 + i)  # deterministic per copy
        signs = np.where(rs.rand(dim) < 0.5, -1.0, 1.0).astype(np.float32)
        v = vec * signs[None, :]
    rng_tables.append(pa.table({
        "vec_id": pa.array(vid + i * N, type=pa.int64()),
        "embedding": pa.array(v.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array(lab, type=pa.int32()),
    }))
pq.write_table(pa.concat_tables(rng_tables), f"{OUT}/embeddings.parquet")
print(f"embeddings: {N*COPIES} rows")
print("done ->", OUT)
