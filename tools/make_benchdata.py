"""Replicate the sf0.1 fixture tables REPS x into ./benchdata/sf{N}
for THROUGHPUT benching at a scale where Spark's fixed per-query floor
amortizes (VERDICT r1: at sf0.1 ~7 s of the 13.6 s total is
scheduler/codegen floor, so engine-vs-DuckDB ratios measure overhead,
not work). Correctness stays pinned to the driver's pristine sf0.01
oracle run — this derived data is for timing only.

Replication preserves join topology (every foreign key shifts by the
same per-domain stride as its primary key) and keeps dimension tables
(region, nation) single-copy. Document text gets a per-replica token
suffix so the near-dup pair structure replicates linearly instead of
exploding quadratically across replicas (identical copies would make
every cross-replica pair a near-dup, which no real corpus does at 10x
growth); embeddings replicate under a per-replica ISOMETRY — a
circular dimension shift plus a deterministic sign pattern (r15 —
r14 VERDICT #8: verbatim replication made every cross-replica pair an
exact duplicate, so q_semantic_dedup's sf>=1 rows measured a
degenerate corpus shape no real deployment has instead of the
operator). Sign flips and shifts applied uniformly within a replica
preserve every within-replica inner product EXACTLY (the fixture's
near-dup/label geometry replicates linearly, like the documents
table), while cross-replica cosines become pseudo-random
(autocorrelation of ~iid components at a nonzero lag), so the
pairwise tiers see a real near-dup distribution. Small additive
jitter was considered and rejected: +-2% noise leaves cross-replica
cosines at ~0.9996, still above any dedup threshold — the quadratic
pair blowup survives. Pure integer arithmetic on (replica, dim) — no
RNG, bit-reproducible across regenerations.

    python tools/make_benchdata.py [reps] [out_dir]

Reproduces every scale tier used in BASELINE.md from the same sf0.1
source (out dir is derived as sf{reps * 0.1}):

    python tools/make_benchdata.py 10    # -> benchdata/sf1   (~240 MB)
    python tools/make_benchdata.py 100   # -> benchdata/sf10  (~2.4 GB)

(The committed benchdata/sf10 tier was generated with reps=100 —
verified 100x the sf0.1 row counts on every fact table.)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", f"sf{reps * 0.1:g}",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    strides = {
        k: con.execute(f"SELECT max({k}) + 1 FROM {tbl}").fetchone()[0]
        for k, tbl in [
            ("c_custkey", "customer"), ("s_suppkey", "supplier"),
            ("p_partkey", "part"), ("o_orderkey", "orders"),
            ("event_id", "events"), ("user_id", "events"),
            ("doc_id", "documents"), ("vec_id", "embeddings"),
        ]
    }

    def rep_union(select_for_rep) -> str:
        return " UNION ALL ".join(select_for_rep(k) for k in range(reps))

    copies = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": rep_union(lambda k: f"""
            SELECT c_custkey + {k * strides['c_custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer"""),
        "supplier": rep_union(lambda k: f"""
            SELECT s_suppkey + {k * strides['s_suppkey']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier"""),
        "part": rep_union(lambda k: f"""
            SELECT p_partkey + {k * strides['p_partkey']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part"""),
        "orders": rep_union(lambda k: f"""
            SELECT o_orderkey + {k * strides['o_orderkey']} AS o_orderkey,
                   o_custkey + {k * strides['c_custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders"""),
        "lineitem": rep_union(lambda k: f"""
            SELECT l_orderkey + {k * strides['o_orderkey']} AS l_orderkey,
                   l_partkey + {k * strides['p_partkey']} AS l_partkey,
                   l_suppkey + {k * strides['s_suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem"""),
        "events": rep_union(lambda k: f"""
            SELECT event_id + {k * strides['event_id']} AS event_id,
                   ts, user_id + {k * strides['user_id']} AS user_id,
                   event_type, value, props
            FROM events"""),
        "documents": rep_union(lambda k: (f"""
            SELECT doc_id AS doc_id, text, lang, source, n_chars
            FROM documents""" if k == 0 else f"""
            SELECT doc_id + {k * strides['doc_id']} AS doc_id,
                   array_to_string(list_transform(string_split(text, ' '),
                                                  x -> x || 'r{k}'), ' ') AS text,
                   lang, source,
                   CAST(length(array_to_string(list_transform(
                       string_split(text, ' '), x -> x || 'r{k}'), ' '))
                       AS BIGINT) AS n_chars
            FROM documents""")),
        # replica 0 stays byte-identical; replicas k > 0 apply the
        # isometry: component i of replica k = sign(k, i) * component
        # ((i - 1 + k) mod d) + 1 — a circular shift by k plus a
        # deterministic per-(k, i) sign. Within a replica both sides
        # of any inner product transform identically, so the fixture
        # geometry is exact; across replicas the shift+sign scramble
        # leaves cosines pseudo-random (and no two k in a 100-rep run
        # share the transform: the sign pattern keys on k directly,
        # so k and k+64 differ even though their shifts alias).
        "embeddings": rep_union(lambda k: f"""
            SELECT vec_id + {k * strides['vec_id']} AS vec_id, embedding, label
            FROM embeddings""" if k == 0 else f"""
            SELECT vec_id + {k * strides['vec_id']} AS vec_id,
                   list_transform(embedding, (x, i) -> CAST(
                       (CASE WHEN ((({k} * 37 + i) * 2654435761)
                                   % 97) % 2 = 0
                             THEN 1 ELSE -1 END)
                       * embedding[((i - 1 + {k})
                                    % len(embedding)) + 1]
                       AS FLOAT)) AS embedding,
                   label
            FROM embeddings"""),
    }
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({copies[t]}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
