#!/usr/bin/env python3
"""Synthesize a larger scale factor from /root/testdata/sf0.1 for the
BASELINE.md §5 scaling measurement (VERDICT r5 item 3).

The driver ships sf{0.001,0.01,0.1} only; proving the scale designs
empirically needs a 10× dataset. This derives one TPC-H-style: the fact
and dimension tables are replicated REPLICAS× with per-table key shifts
(shift constant = max key + 1, so replica keyspaces are disjoint and
every foreign key lands in the matching replica's dimension rows), while
`region`/`nation` stay fixed — exactly how TPC-H SF scaling behaves
(more facts over the same date window and the same tiny dims).

Two tables need more than a key shift to avoid measurement artifacts:

* documents — verbatim replica texts would make every replica pair an
  exact/near duplicate, so the dedup family's OUTPUT (not its input)
  would explode ~REPLICAS²× and the scaling table would measure a data
  artifact instead of the operator. Replica i>0 texts are spliced from
  two different source docs (first half of doc d + second half of doc
  (d + 997·i) mod N): token-length distribution and vocabulary are
  preserved, shingle overlap with any original is ~0.5 — far below the
  0.8 jaccard near-dup threshold — and the unigram bag differs, so
  simhash does not collapse either.
* embeddings — perturbed replicas would sit at cosine ≈ 1 to their
  source vector, forming REPLICAS-cliques of artificial near-dups.
  Replica vectors are instead freshly sampled (seeded, deterministic)
  from a normal matched to the originals' global mean/std, keeping the
  corpus near-orthogonal at every SF, which is the character of the
  shipped data. Labels copy the source row's so the label distribution
  is preserved.

Output: $OUT_DIR (default /root/repo/.scale/sf1.0) — one parquet per
table, loadable by every queries() entry via load_table(). Gitignored;
regenerate with `python tools/scale_up.py` (~30 s, DuckDB + pyarrow,
no JVM).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT_DIR", "/root/repo/.scale/sf1.0")
REPLICAS = int(os.environ.get("REPLICAS", "10"))

# per-table key shift constants (max key + 1 in sf0.1, verified)
N_CUST, N_ORD, N_SUPP, N_PART = 15_000, 150_000, 1_000, 20_000
N_EVT, N_DOC, N_VEC = 100_000, 5_000, 2_000



def _check_src_ids(ids, n_shift: int, name: str) -> None:
    """Replica ids are built as src_id + i*n_shift; uniqueness across
    replicas requires every source id in [0, n_shift) and no source
    duplicates (ADVICE r7). Fail loudly instead of silently corrupting
    min-id canonical labels downstream."""
    lo, hi = min(ids), max(ids)
    if not (0 <= lo and hi < n_shift):
        raise SystemExit(
            f"{name}: source ids span [{lo}, {hi}] outside [0, {n_shift}); "
            f"replica shift i*{n_shift} would collide — fix the shift constant"
        )
    if len(set(ids)) != len(ids):
        raise SystemExit(f"{name}: duplicate source ids; replication would compound them")


def _copy(con, table: str, select_per_replica: str) -> None:
    """UNION ALL of `select_per_replica` (templated on {i}) over all
    replicas, written as one parquet file."""
    union = " UNION ALL ".join(
        select_per_replica.format(i=i) for i in range(REPLICAS)
    )
    con.sql(
        f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
    )


def relational() -> None:
    con = duckdb.connect()
    for t in ("region", "nation"):  # fixed dims: verbatim single copy
        con.sql(
            f"COPY (FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
    _copy(
        con,
        "customer",
        f"SELECT c_custkey + {{i}} * {N_CUST} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'",
    )
    _copy(
        con,
        "supplier",
        f"SELECT s_suppkey + {{i}} * {N_SUPP} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'",
    )
    _copy(
        con,
        "part",
        f"SELECT p_partkey + {{i}} * {N_PART} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'",
    )
    _copy(
        con,
        "orders",
        f"SELECT o_orderkey + {{i}} * {N_ORD} AS o_orderkey, "
        f"o_custkey + {{i}} * {N_CUST} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{SRC}/orders.parquet'",
    )
    _copy(
        con,
        "lineitem",
        f"SELECT l_orderkey + {{i}} * {N_ORD} AS l_orderkey, "
        f"l_partkey + {{i}} * {N_PART} AS l_partkey, "
        f"l_suppkey + {{i}} * {N_SUPP} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'",
    )
    # events.user_id references the customer keyspace (verified: all
    # 100k sf0.1 events join c_custkey), so it shifts with custkey
    _copy(
        con,
        "events",
        f"SELECT event_id + {{i}} * {N_EVT} AS event_id, ts, "
        f"user_id + {{i}} * {N_CUST} AS user_id, event_type, value, "
        f"props FROM '{SRC}/events.parquet'",
    )


def documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    _check_src_ids([r["doc_id"] for r in rows], N_DOC, "documents")
    n = len(rows)
    out = list(rows)  # replica 0 verbatim
    for i in range(1, REPLICAS):
        for d, r in enumerate(rows):
            partner = rows[(d + 997 * i) % n]
            w1, w2 = r["text"].split(), partner["text"].split()
            text = " ".join(w1[: len(w1) // 2] + w2[len(w2) // 2 :])
            out.append(
                {
                    "doc_id": r["doc_id"] + i * N_DOC,
                    "text": text,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(text),
                }
            )
    pq.write_table(
        pa.Table.from_pylist(out, schema=t.schema),
        f"{OUT}/documents.parquet",
    )


def embeddings() -> None:
    # Caveat (ADVICE r6): replicas i>=1 copy the source LABELS onto
    # freshly random vectors, so label-conditioned geometry queries
    # (label_centroids, knn_label_predict) measure noise at the
    # synthesized SF — they remain fine for THROUGHPUT scaling, which
    # is this tool's purpose, but their values are not meaningful
    # beyond replica 0. Replica 0 is verbatim, preserving the source
    # vec_id values (documents() likewise preserves doc_id).
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    base = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(t.column("label").to_pylist())
    src_ids = list(t.column("vec_id").to_pylist())
    _check_src_ids(src_ids, N_VEC, "embeddings")
    mu, sd = float(base.mean()), float(base.std())
    vec_ids = [src_ids]  # replica 0 verbatim
    vecs, labs = [base], [labels]
    for i in range(1, REPLICAS):
        rng = np.random.default_rng(4242 + i)
        vecs.append(
            (mu + sd * rng.standard_normal(base.shape)).astype(np.float32)
        )
        labs.append(labels)
        vec_ids.append([v + i * N_VEC for v in src_ids])
    table = pa.table(
        {
            "vec_id": pa.array(
                [v for chunk in vec_ids for v in chunk], pa.int64()
            ),
            "embedding": pa.array(
                [row.tolist() for m in vecs for row in m],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(
                [int(v) for chunk in labs for v in chunk], pa.int32()
            ),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    relational()
    documents()
    embeddings()
    # in-process regeneration at a path already measured must drop the
    # cached modal embedding dimension (io.py, ADVICE r9)
    import importlib.util

    if importlib.util.find_spec("dbscan_spark") is not None:
        from dbscan_spark.io import clear_modal_dim_cache

        clear_modal_dim_cache(OUT)
    # purge derived on-disk mirrors (keyed by basename, memoized via
    # _SUCCESS) so regeneration can't leave a stale mirror behind
    import shutil

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = os.path.basename(os.path.normpath(OUT))
    for root in (".json_mirror", ".blob_mirror"):
        p = os.path.join(repo_root, root, key)
        if os.path.isdir(p):
            shutil.rmtree(p)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.sql(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n, file=sys.stderr)
    print(OUT)


if __name__ == "__main__":
    main()
