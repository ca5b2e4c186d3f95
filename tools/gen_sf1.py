#!/usr/bin/env python3
"""Generate sf1 testdata as a deterministic x10 scale-up of sf0.1.

Driver-side tooling only (the engine itself is pure Scala/Spark) —
used to produce the r16 scaling-evidence bench (BENCH_sf1.json).

Scale rules (all deterministic, no RNG except seeded per-replica):
  - region/nation: dimension tables, copied unchanged;
  - customer/supplier/part/orders/lineitem: 10 replicas with keys
    shifted by i*N per replica (keys stay dense 0..10N-1, and each
    replica's FK graph is internally consistent — the same holds for
    o_custkey / l_partkey / l_suppkey / l_orderkey);
  - events: event_id/user_id shifted; ts kept (same time window at
    10x density — the realistic shape of a 10x bigger day);
  - documents: doc_id shifted; replica i>0 texts are the SAME word
    multiset under a seeded per-replica permutation — token/length
    stats are preserved, shingle-level near-dup structure is NOT
    (different docs), and exact-dup groups replicate once per replica,
    so the corpus dup RATE stays constant while volume grows 10x
    (naive text copying would grow candidate pairs 100x — skew, not
    scale);
  - embeddings: vec_id shifted; replica i rotates every vector by i
    dimensions — norms and within-replica pairwise dot products are
    EXACTLY preserved (per-replica ANN structure identical to sf0.1),
    cross-replica similarities decorrelate.
"""
import duckdb, os, sys, random

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata-sf1"
REPL = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, sql_per_replica, copy=False):
    out = f"{DST}/{table}.parquet"
    src = f"{SRC}/{table}.parquet"
    if copy:
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{out}' (FORMAT PARQUET)")
    else:
        parts = " UNION ALL ".join(
            sql_per_replica(i).replace("__SRC__", f"'{src}'")
            for i in range(REPL))
        con.execute(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows")

counts = {t: con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
          for t in ["customer", "supplier", "part", "orders", "lineitem",
                    "events", "documents", "embeddings"]}
NC, NS, NP, NO = counts["customer"], counts["supplier"], counts["part"], counts["orders"]
NE, ND, NV = counts["events"], counts["documents"], counts["embeddings"]

gen("region", None, copy=True)
gen("nation", None, copy=True)

gen("customer", lambda i: f"""
  SELECT c_custkey + {i * NC} AS c_custkey,
         CASE WHEN {i} = 0 THEN c_name ELSE c_name || '-r{i}' END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment FROM __SRC__""")

gen("supplier", lambda i: f"""
  SELECT s_suppkey + {i * NS} AS s_suppkey,
         CASE WHEN {i} = 0 THEN s_name ELSE s_name || '-r{i}' END AS s_name,
         s_nationkey, s_acctbal FROM __SRC__""")

gen("part", lambda i: f"""
  SELECT p_partkey + {i * NP} AS p_partkey,
         CASE WHEN {i} = 0 THEN p_name ELSE p_name || ' r{i}' END AS p_name,
         p_brand, p_type, p_size, p_retailprice FROM __SRC__""")

gen("orders", lambda i: f"""
  SELECT o_orderkey + {i * NO} AS o_orderkey,
         o_custkey + {i * NC} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM __SRC__""")

gen("lineitem", lambda i: f"""
  SELECT l_orderkey + {i * NO} AS l_orderkey,
         l_partkey + {i * NP} AS l_partkey,
         l_suppkey + {i * NS} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate FROM __SRC__""")

# user_id domain: shift by its span so replicas' users are disjoint
u_lo, u_hi = con.execute(
    f"SELECT min(user_id), max(user_id) FROM '{SRC}/events.parquet'").fetchone()
USPAN = (u_hi - u_lo) + 1
gen("events", lambda i: f"""
  SELECT event_id + {i * NE} AS event_id, ts,
         user_id + {i * USPAN} AS user_id,
         event_type, value, props FROM __SRC__""")

# documents: seeded per-replica word permutation (see module doc)
docs = con.execute(f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' ORDER BY doc_id").fetchall()
rows = []
for i in range(REPL):
    rnd = random.Random(1000 + i)
    # ONE permutation order per replica, applied by word count so
    # equal texts stay equal (dup groups replicate linearly)
    perm_cache = {}
    for (doc_id, text, lang, source) in docs:
        if i == 0:
            t = text
        else:
            words = text.split(" ")
            k = len(words)
            if k not in perm_cache:
                p = list(range(k))
                random.Random(1000 + i * 100003 + k).shuffle(p)
                perm_cache[k] = p
            # shuffle breaks shingle-level similarity; tagging every
            # 4th word ALSO breaks word-SET/multiset invariance, so
            # permutation-invariant methods (word-set Jaccard, unigram
            # SimHash) don't see the replica set as a 10-clique —
            # cross-replica pair growth stays linear, like a real 10x
            # corpus
            t = " ".join(
                (w + f"r{i}" if j % 4 == 0 else w)
                for j, w in ((jj, words[pp]) for jj, pp in enumerate(perm_cache[k])))
        rows.append((doc_id + i * ND, t, lang, source, len(t)))
con.execute("CREATE TABLE docs_out (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO docs_out VALUES (?,?,?,?,?)", rows)
con.execute(f"COPY (SELECT * FROM docs_out ORDER BY doc_id) TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print(f"documents: {len(rows)} rows")

# embeddings: rotate vector by i dims per replica (norm/dot preserving
# within a replica). DuckDB list slicing is 1-based inclusive.
dim = con.execute(
    f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]
gen("embeddings", lambda i: f"""
  SELECT vec_id + {i * NV} AS vec_id,
         CASE WHEN {i % dim} = 0 THEN embedding
              ELSE list_concat(embedding[{i % dim + 1}:{dim}],
                               embedding[1:{i % dim}]) END
           ::FLOAT[] AS embedding,
         label FROM __SRC__""")

print("done ->", DST)
