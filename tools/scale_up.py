#!/usr/bin/env python3
"""Scale a testdata SF directory by NX for empirical scale sampling
(e.g. sf0.1 -> ~sf1.0): each replica offsets the entity keys so
referential joins stay consistent, mangles document text per replica
(shifted-letter translate -> disjoint shingle spaces, so the corpus
does NOT become 10x wall-to-wall duplicates) and rotates embedding
vectors (a rotated random vector is ~orthogonal to its original, so
near-dup/ANN density stays realistic). Dims (region, nation) are
shared and stay fixed.

Usage: python3 tools/scale_up.py <srcSfDir> <dstDir> [replicas=10]
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# the letter-shift mangle cycles the 26-letter alphabet (a shorter
# translate target would DELETE letters) and the embedding rotation
# index must stay below the vector length
assert 1 <= N <= 26, f"replicas must be in [1, 26], got {N}"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

OFF = {"order": 10**9, "cust": 10**8, "supp": 10**7, "part": 10**7,
       "event": 10**9, "user": 10**8, "doc": 10**8, "vec": 10**8}
ALPHA = "abcdefghijklmnopqrstuvwxyz"

def rep(t, select_i):
    parts = [f"SELECT {select_i(i)} FROM read_parquet('{src}/{t}.parquet')"
             for i in range(N)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)

# shared dims: copy as-is
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

rep("customer", lambda i:
    f"c_custkey + {i*OFF['cust']} AS c_custkey, c_name, c_nationkey, "
    "c_acctbal, c_mktsegment")
rep("supplier", lambda i:
    f"s_suppkey + {i*OFF['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal")
rep("part", lambda i:
    f"p_partkey + {i*OFF['part']} AS p_partkey, p_name, p_brand, p_type, "
    "p_size, p_retailprice")
rep("orders", lambda i:
    f"o_orderkey + {i*OFF['order']} AS o_orderkey, "
    f"o_custkey + {i*OFF['cust']} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
rep("lineitem", lambda i:
    f"l_orderkey + {i*OFF['order']} AS l_orderkey, "
    f"l_partkey + {i*OFF['part']} AS l_partkey, "
    f"l_suppkey + {i*OFF['supp']} AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate")
rep("events", lambda i:
    f"event_id + {i*OFF['event']} AS event_id, ts, "
    f"user_id + {i*OFF['user']} AS user_id, event_type, value, props")
rep("documents", lambda i:
    f"doc_id + {i*OFF['doc']} AS doc_id, " +
    ("text AS text, " if i == 0 else
     f"translate(text, '{ALPHA}', '{ALPHA[i:] + ALPHA[:i]}') AS text, ") +
    "lang, source, n_chars")
rep("embeddings", lambda i:
    f"vec_id + {i*OFF['vec']} AS vec_id, " +
    ("embedding AS embedding, " if i == 0 else
     f"list_concat(embedding[{i+1}:], embedding[1:{i}]) AS embedding, ") +
    "label")
print("done ->", dst)
