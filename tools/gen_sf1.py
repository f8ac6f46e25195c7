#!/usr/bin/env python3
"""Builder tooling only (like verify_local.py): synthesize scaled-up
datasets (sf1/sf10/sf30/sf100 = 10/100/300/1000x sf0.1) for the LOCAL
scaling self-measurements the round-12..15 verdicts asked for ("run the
bench once at sf1 ... chase any query whose time grows faster than ~10x";
r14 #4: "extend to sf30-sf100 for the tables the dedup/ANN/streaming
families read"). The driver provides no big testdata, so this scales up
/root/testdata/sf0.1 by replication with key remapping. NOT used by any
gated query or spec — correctness gates stay on driver testdata.

Design (kept deliberately structure-preserving so per-query cost should
scale ~linearly if the PLAN is linear):
- region/nation stay fixed (TPC-H semantics: constant dims).
- every other table gets COPIES copies; copy i offsets each key by
  i*count, so FK joins stay consistent within a copy and fan-outs per key
  are UNCHANGED (a join that produced k rows/key still produces k rows/key).
- documents: copy i>0 suffixes every word with 'x<i>' so cross-copy
  shingle Jaccard is ~0 — replicating text verbatim would hand every doc
  COPIES-1 artificial near-duplicates and blow up all dedup candidate sets
  quadratically for a reason that has nothing to do with plan quality.
  Within-copy near-dup structure is preserved exactly (the same rewrite
  is applied to every doc in the copy).
- embeddings: copy i flips the sign of a per-copy pseudo-random subset of
  dimensions. Within-copy dot products are EXACTLY preserved (s_j^2 = 1),
  cross-copy similarities become incoherent — same rationale as documents.

Writes stream one copy at a time through a ParquetWriter (one row group
per copy), so COPIES=1000 needs copy-sized memory, not corpus-sized, and
never builds a 1000-branch UNION ALL.

Usage: gen_sf1.py [OUT [COPIES [TABLES]]]
  TABLES: comma-separated subset (default: all). The r15 decade push uses
  'documents,embeddings,events' — the three tables the dedup/ANN/streaming
  families read (lineitem at sf100 would not fit the sandbox). region and
  nation are always emitted (constant dims, a few KB).

Output: OUT/<table>.parquet (single file each, same layout as driver
testdata).
"""
import duckdb, numpy as np, os, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 100 -> sf10
TABLES = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def want(t):
    return TABLES is None or t in TABLES

def copy_fixed(t):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

def streamed_write(t, copies_iter):
    """Write an iterator of Arrow tables as OUT/<t>.parquet, one row group
    each. Writes to a .tmp name and renames on success, closing the writer
    in a finally (r15 ADVICE): an aborted run must never leave a truncated
    OUT/<t>.parquet that a rerun or consumer mistakes for complete data,
    and COPIES=0 must fail loudly rather than crash on writer=None."""
    tmp, final = f"{OUT}/{t}.parquet.tmp", f"{OUT}/{t}.parquet"
    writer = None
    n = 0
    try:
        for batch in copies_iter:
            if writer is None:
                writer = pq.ParquetWriter(tmp, batch.schema)
            writer.write_table(batch)
            n += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    if writer is None:
        raise SystemExit(f"{t}: zero copies produced (COPIES={COPIES}?) — nothing written")
    os.replace(tmp, final)
    print(f"{t}: {n} rows", flush=True)

def replicate(t, sql_for_copy):
    """sql_for_copy(i) -> a SELECT producing copy i; streamed one row group
    per copy (memory stays copy-sized at COPIES=1000)."""
    if not want(t):
        return
    def copies():
        for i in range(COPIES):
            arr = con.execute(sql_for_copy(i)).arrow()
            yield pa.table(arr) if not isinstance(arr, pa.Table) else arr
    streamed_write(t, copies())

copy_fixed("region"); copy_fixed("nation")
print("region/nation: fixed", flush=True)

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

# embeddings: numpy sign-flip per copy (duckdb lambdas lack an index arg),
# streamed one row group per copy like replicate()
if want("embeddings"):
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)  # (N, 64)
    vid = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    lab = np.array(tbl.column("label").to_pylist(), dtype=np.int32)
    N, dim = vec.shape
    def emb_copies():
        for i in range(COPIES):
            if i == 0:
                v = vec
            else:
                rs = np.random.RandomState(42 + i)  # deterministic per copy
                signs = np.where(rs.rand(dim) < 0.5, -1.0, 1.0).astype(np.float32)
                v = vec * signs[None, :]
            yield pa.table({
                "vec_id": pa.array(vid + i * N, type=pa.int64()),
                "embedding": pa.array(v.tolist(), type=pa.list_(pa.float32())),
                "label": pa.array(lab, type=pa.int32()),
            })
    streamed_write("embeddings", emb_copies())
print("done ->", OUT, flush=True)
