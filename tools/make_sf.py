#!/usr/bin/env python3
"""Deterministic N-x scale-up of a graft test SF directory (driver-side
tooling, like the other scripts here — NOT part of the library).

Construction: key-offset TILING. Each output table is N copies of the
source table; copy i offsets every primary and foreign key by
i * keyspace(table), so each tile is a self-consistent TPC-H-ish
database and every FK ratio (orders/customer, lineitem/part, events/
user) is preserved exactly. nation/region stay fixed (TPC-H keeps the
geo dims constant across SF). Row order is (tile, original order) —
fully deterministic, no RNG.

Two tables get a per-tile PERTURBATION so corpus workloads scale
LINEARLY instead of super-linearly:
  - documents: tile i>0 suffixes every whitespace token with the tile
    number (and recomputes n_chars). Within-tile duplicate/near-dup
    structure is preserved exactly (identical texts stay identical);
    cross-tile shingle overlap drops to ~zero, so candidate-pair
    counts grow ~N-fold, not N^2-fold as a verbatim copy would.
  - embeddings: tile i applies a SIGNED DIMENSION ROTATION (roll the
    64 dims by i, flip signs on a per-tile bit pattern). That is an
    orthogonal transform: all within-tile dot products and cosines
    are preserved EXACTLY (permutation and negation are exact float
    ops), while cross-tile similarity structure is scrambled — the
    ANN workload becomes N independent shards of the original
    geometry, the linear-scaling shape a 10x corpus actually has.

Usage: tools/make_sf.py [srcDir] [outDir] [N]
       tools/make_sf.py /root/testdata/sf0.1 /tmp/graft-sf1 10
"""
import sys, os
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# keyspaces measured from the source (all keys are 0-based dense)
K = {}
for tbl, col in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
    K[tbl] = con.sql(
        f"SELECT max({col}) + 1 FROM read_parquet('{src}/{tbl}.parquet')"
    ).fetchone()[0]

def tile(tbl, select_expr, order_key):
    # ORDER BY must be TOTAL (tile, primary key), not just the tile
    # index: DuckDB's parallel scan delivers source rows in
    # nondeterministic order, and sorting only on r.i would let two
    # invocations produce byte-different parquets — breaking the
    # deterministic-regeneration claim and churning (size, mtime)
    # fixture keys
    con.execute(f"""
        COPY (
          SELECT {select_expr}
          FROM read_parquet('{src}/{tbl}.parquet') t
          CROSS JOIN range({N}) r(i)
          ORDER BY r.i, {order_key}
        ) TO '{out}/{tbl}.parquet' (FORMAT parquet)
    """)
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{tbl}.parquet')").fetchone()[0]
    print(f"{tbl}: {n} rows")

# fixed geo dims: copy verbatim
for tbl in ("region", "nation"):
    con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet'))
                    TO '{out}/{tbl}.parquet' (FORMAT parquet)""")
    print(f"{tbl}: copied")

tile("customer", order_key="t.c_custkey", select_expr=f"""
    CAST(c_custkey + i * {K['customer']} AS BIGINT) AS c_custkey,
    c_name, c_nationkey, c_acctbal, c_mktsegment""")

tile("part", order_key="t.p_partkey", select_expr=f"""
    CAST(p_partkey + i * {K['part']} AS BIGINT) AS p_partkey,
    p_name, p_brand, p_type, p_size, p_retailprice""")

tile("supplier", order_key="t.s_suppkey", select_expr=f"""
    CAST(s_suppkey + i * {K['supplier']} AS BIGINT) AS s_suppkey,
    s_name, s_nationkey, s_acctbal""")

tile("orders", order_key="t.o_orderkey", select_expr=f"""
    CAST(o_orderkey + i * {K['orders']} AS BIGINT) AS o_orderkey,
    CAST(o_custkey + i * {K['customer']} AS BIGINT) AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""")

tile("lineitem", order_key="t.l_orderkey, t.l_linenumber", select_expr=f"""
    CAST(l_orderkey + i * {K['orders']} AS BIGINT) AS l_orderkey,
    CAST(l_partkey + i * {K['part']} AS BIGINT) AS l_partkey,
    CAST(l_suppkey + i * {K['supplier']} AS BIGINT) AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate""")

# events.user_id references customer keys (stream_enrich joins
# user_id = c_custkey), so users offset by the CUSTOMER keyspace
tile("events", order_key="t.event_id", select_expr=f"""
    CAST(event_id + i * {K['events']} AS BIGINT) AS event_id,
    ts,
    CAST(user_id + i * {K['customer']} AS BIGINT) AS user_id,
    event_type, value, props""")

# documents: per-tile token suffix (tile 0 verbatim), n_chars kept
# equal to len(text) as in the source
tile("documents", order_key="t.doc_id", select_expr=f"""
    CAST(doc_id + i * {K['documents']} AS BIGINT) AS doc_id,
    CASE WHEN i = 0 THEN text
         ELSE regexp_replace(text, '(\\S+)', '\\1' || CAST(i AS VARCHAR), 'g')
    END AS text,
    lang, source,
    CAST(len(CASE WHEN i = 0 THEN text
         ELSE regexp_replace(text, '(\\S+)', '\\1' || CAST(i AS VARCHAR), 'g')
    END) AS BIGINT) AS n_chars""")

# embeddings: signed dimension rotation per tile (orthogonal — exact)
t = pq.read_table(f"{src}/embeddings.parquet")
emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
vec_id = t["vec_id"].to_numpy()
label = t["label"].to_numpy()
d = emb.shape[1]
tiles = []
for i in range(N):
    e = np.roll(emb, -i, axis=1)
    if i:
        # deterministic per-tile sign pattern (Knuth multiplicative)
        signs = np.where(((np.arange(d) * 2654435761 + i * 40503) >> 7) % 2 == 0,
                         np.float32(1.0), np.float32(-1.0))
        e = e * signs
    tiles.append(pa.table({
        "vec_id": pa.array(vec_id + i * K["embeddings"], type=pa.int64()),
        "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
        "label": pa.array(label, type=pa.int32()),
    }))
pq.write_table(pa.concat_tables(tiles), f"{out}/embeddings.parquet")
print(f"embeddings: {N * len(vec_id)} rows")

# schema parity check vs source
for f in sorted(os.listdir(out)):
    tbl = f[:-8]
    s0 = pq.read_schema(f"{src}/{f}")
    s1 = pq.read_schema(f"{out}/{f}")
    assert [str(s0.field(n).type) for n in s0.names] == \
           [str(s1.field(n).type) for n in s1.names], \
        f"{tbl}: schema drift {s1} vs {s0}"
print(f"done: {out} at {N}x {src}")
