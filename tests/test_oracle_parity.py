"""Every queries() entry must match its DuckDB oracle twin — the same check
the driver runs (row count + schema + order-insensitive values), exercised
at sf0.001 in CI so mismatches surface before the driver's sf0.01 gate."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from dbscan_spark.io import TABLES
from tests.conftest import SF_TINY

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_TINY}/{t}.parquet'")
    return c


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, normalize cell values, return sorted row tuples
    (order-insensitive comparison, like the driver's value hash)."""
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                canon.append(None)
            elif isinstance(v, (np.floating, float)):
                canon.append(round(float(v), 6))
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                canon.append(int(v))
            elif isinstance(v, pd.Timestamp):
                canon.append(v.isoformat())
            else:
                canon.append(str(v))
        rows.append(tuple(canon))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_every_query_has_callable():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got_df = qs[name](spark, SF_TINY).toPandas()
    if name not in oracles:
        # rows-only contract: must run and produce a stable schema
        assert got_df.shape[0] >= 0
        return
    want_df = con.sql(oracles[name]).df()
    assert sorted(got_df.columns) == sorted(want_df.columns), (
        f"{name}: column names differ: {sorted(got_df.columns)} "
        f"vs {sorted(want_df.columns)}"
    )
    assert got_df.shape[0] == want_df.shape[0], (
        f"{name}: row count {got_df.shape[0]} != oracle {want_df.shape[0]}"
    )
    got_rows, want_rows = canonicalize(got_df), canonicalize(want_df)
    mismatches = [
        (g, w) for g, w in zip(got_rows, want_rows) if g != w
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


@pytest.mark.parametrize(
    "name",
    [
        "join_asof_last_click",
        "sample_stratified_orders",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_topk_lsh",
        "ann_topk_ivf",
        "ann_topk_pq",
        "dedup_cluster_cc",
        "supplier_pagerank",
        "kmeans_embeddings",
        "graph_triangle_counts",
        "dbscan_flags",
        "dbscan_core_components",
        "agg_heavy_hitters",
        "customers_rfm_segments",
        "parts_abc_analysis",
        # round-3 additions with iteration / floats / Python stages
        "graph_bfs_reach",
        "embedding_covariance",
        "embedding_pca_2d",
        "events_holt_forecast",
        "events_cusum_alerts",
        "basket_part_affinity",
        "pysource_synthetic_events",
        # round-8 additions: iterative training + hash-rate sampling
        "text_bpe_encode",
        "corpus_sample_mixture",
    ],
)
def test_query_is_run_deterministic(spark, name):
    """The driver's value hash assumes each query returns identical
    results on identical data — guard the queries whose construction
    involves sampling, hashing, iteration, or sketches by running them
    twice and comparing canonicalized outputs."""
    fn = entry_mod.queries()[name]
    a = canonicalize(fn(spark, SF_TINY).toPandas())
    b = canonicalize(fn(spark, SF_TINY).toPandas())
    assert a == b, name
