"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries and oracles are aggregated from the operator modules in
``dbscan_spark/operators/`` — each module owns its QUERIES/ORACLE pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Expose the container's vendored protobuf runtime to this (driver)
# process and — via PYTHONPATH, IF the JVM has not forked yet — to the
# Python workers, exactly as tests/conftest.py does for the test env.
# Needed only by transformWithState's state-server protocol; the one
# graded consumer (streaming_stateful_totals) PROBES worker-side
# availability and falls back to the value-identical
# applyInPandasWithState twin, so this block is best-effort: a no-op
# when protobuf is installed, the vendored copy is absent, or the
# driver created its SparkSession before importing this module.
_PB_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "_protobuf_shim"
)
if os.path.isdir(_PB_SHIM_DIR):
    os.environ["PYTHONPATH"] = (
        _PB_SHIM_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    if _PB_SHIM_DIR not in sys.path:
        sys.path.insert(0, _PB_SHIM_DIR)
    try:
        import _pb_shim  # noqa: F401  (applies the shim in-process)
    except Exception:
        pass

_SF_TINY = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: distributed DBSCAN over the embeddings table
    (2-D projection, mirroring the reference's 2-D rule,
    DBSCANPoint.scala:23-24); driver checks rows>0."""
    from pyspark.sql import functions as F

    from dbscan_spark import dbscan

    emb = spark.read.parquet(f"{_SF_TINY}/embeddings.parquet")
    pts = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    return dbscan(pts, eps=0.05, min_points=5, max_points_per_partition=250)


def _operator_modules():
    """Operator modules (aggregation only; ordering is done below)."""
    mods = []
    for name in (
        "text",
        "multimodal",
        "relational",
        "similarity",
        "dedup",
        "ml",
        "streaming_queries",
    ):
        try:
            mods.append(
                __import__(f"dbscan_spark.operators.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods


# REGISTRATION_ORDER — self-rotating.
#
# The driver grades exactly 50 queries per round, in registration order.
# `_ordered` below therefore orders the registry dynamically from the
# CORRECTNESS_r*.json files present in the repo:
#   1. `_PRIORITY` entries not yet graded clean (hand-ordered hot list —
#      round 4's dark-set cohort, all oracle-backed);
#   2. every other never-graded query, oracle-backed (exact hash signal)
#      before rows-only, in module registration order;
#   3. already-graded queries, stalest grading round first, so greens
#      are re-confirmed cyclically once the dark set drains.
# A driver row with err == "no_oracle" counts as graded — that is the
# driver's success stamp for rows-only queries (the query ran; only the
# check is weaker). Counting it as dark would re-grade the same
# rows-only queries at the head of every round forever (the round-3
# rotation bug, VERDICT r3 "What's wrong #1").
#
# No manual swap is needed between rounds: when CORRECTNESS_r04.json
# lands, the round-5 cohort self-assembles (and so on). _PRIORITY below
# IS the expected round-4 cohort (50 names, all oracle-backed, heavy
# queries last so a budget truncation never starves cheap rows), kept
# as the verification target for tools/driver_sim.py --first 50; all
# pre-verified green at sf0.01 in the round-3 full-registry sim.
#
# ROUND 5 EXPECTED (188 graded r1-r4 => 31 dark): the dark set in
# canonical order with cheap oracle-backed entries first, then cheap
# rows-only, then the `_HEAVY` tail (multi-second iterative/DBSCAN
# queries, so a time-budget truncation can only cost those rows) —
# then the six `_REGRADE` bumps (customers_rfm_segments,
# parts_abc_analysis: graded green r3 BEFORE the round-4
# global_order_stats rewrite changed their physical plans, VERDICT r4
# "Next round" #2; dedup_minhash_lsh, dedup_cluster_cc: upgraded to
# exact oracles in r5; agg_approx_distinct, multimodal_frame_sample:
# exact oracles landed after their early rows-only stamps) — then 13
# re-greens, stalest (round 1) first.
_PRIORITY = [
    # O22 driver row (DBSCAN.scala:244-251 predict) — the last
    # reference-API touchpoint without driver signal; first in line.
    "dbscan_predict_canonical",
    # never-graded text / multimodal tail (SQL oracles)
    "text_pii_scrub",
    "corpus_language_entropy",
    "text_vocab_growth",
    "text_bm25_search",
    "corpus_boilerplate_ngrams",
    "text_lm_quality",
    "corpus_train_split",
    "text_contamination_bloom",
    "text_bpe_pair_merges",
    "text_bigram_lm_quality",
    "multimodal_chunk_dedup",
    # renamed multimodal_resize_stub -> multimodal_resize in r12 (real
    # decoder; the `if n in raw` guard makes the old name inert)
    "multimodal_resize",
    # never-graded relational / time-series / stats / governance
    "events_ewma_user_value",
    "layout_zorder_buckets",
    "agg_incremental_daily",
    "events_scd2_user_state",
    "stats_supplier_trend",
    "events_mad_outliers",
    "snapshot_diff_orders",
    "events_path_transitions",
    "window_sliding_distinct_users",
    "events_concurrency_hourly",
    "events_ohlc_daily",
    "window_cume_dist_spend",
    "skyline_pareto_parts",
    "events_gapfill_interp",
    "basket_part_affinity",
    "orc_roundtrip_supplier",
    "events_seasonality_profile",
    "events_ab_welch_t",
    "stats_return_rate_wilson",
    "governance_masked_customers",
    "events_cusum_alerts",
    "events_holt_forecast",
    "geo_points_in_boxes",
    "partitioned_prune_events",
    "json_corrupt_tolerant_read",
    "schema_evolution_read",
    "events_funnel_latency",
    "orders_seasonal_decompose",
    "events_dn_retention",
    "customers_cohort_ltv",
    "governance_erasure_audit",
    "join_asof_next_view",
    "events_seasonal_anomalies",
    "events_pattern_vvp",
    "rel_division_priorities",
    # heavy tail (8-9 s each at sf0.01) — last, so a time-budget
    # truncation can only cost these two rows, never the cheap ones
    "pysource_synthetic_events",
    "dbscan_flags_64d",
]

# _REGRADE — queries whose implementation (or oracle) changed after
# their last driver grade; the value is the last round whose grades
# are stale. A graded entry n with graded_round <= _REGRADE[n] jumps
# to the head of the green block so the driver re-certifies the new
# code; it falls back into the normal stalest-first rotation
# automatically once a newer grade lands.
_REGRADE = {
    # (All 27 round-14 bumps — the multimodal phash trio, the r14
    # optimization-pass cohort (shingle consumers, vote-fold family,
    # tfidf/inverted_index/contamination, json mirror pair), the
    # streaming-restart family, and the IVF-PQ trio — were ALL
    # re-graded clean in CORRECTNESS_r14 (50/50) and pruned at
    # round-15 open; manifest re-baselined via
    # tools/query_hashes.py --write.)
    #
    # round 15 (VERDICT r14 #1): the standalone language vote restored
    # to the five-filter formulation (_lang_counts_filters) — the r14
    # single-pass fold was slower where the expression runs once per
    # row; value-identical (collect-compared at sf0.1) and re-verified
    # vs the DuckDB oracle at sf0.001 + sf0.01 before commit:
    "text_language_id": 14,
    "text_language_confusion": 14,
    # corpus_ccnet_pipeline inherits _lang_vote (its LM-perplexity
    # language gate) — value-identical, oracle re-verified at
    # sf0.001 + sf0.01:
    "corpus_ccnet_pipeline": 14,
    # round 15 (VERDICT r14 #2, json mirror): the events JSON mirror is
    # written at the source's natural split structure again (the r14
    # 32-file rebalance reverted) — rows identical, layout changed;
    # both consumers re-verified at sf0.001 + sf0.01:
    "json_source_events": 14,
    "json_corrupt_tolerant_read": 14,
    # round 15 (VERDICT r14 #2): MinHash signatures computed row-locally
    # over the per-key shingle-hash arrays (_sig_from_hash_arrays) —
    # explode + 64-slot hash-aggregate dropped for both the document-
    # and paragraph-level pipelines; signatures bit-identical
    # (collect-compared), every consumer re-verified vs the DuckDB
    # oracle at sf0.001 + sf0.01 before commit:
    "dedup_minhash_lsh": 14,
    "dedup_cluster_cc": 14,
    "dedup_keep_best": 14,
    "corpus_split_leakage": 14,
    "dedup_semantic_keep_best": 14,
    "corpus_paragraph_neardup": 14,
    "corpus_paragraph_clean": 14,
    "corpus_paragraph_dedup": 14,
    "corpus_published_clean": 14,
    # round 15 (VERDICT r14 #4): the four k-gram count tables now come
    # from ONE GROUPING SETS aggregation over the event stream (one
    # scan + one checkpoint instead of four); tables verified
    # bit-identical at sf0.01, all four consumers re-verified vs the
    # DuckDB oracle at sf0.001 + sf0.01 (corpus_ccnet_pipeline bump
    # above already covers it):
    "text_5gram_kn_quality": 14,
    "text_5gram_kn_pruned": 14,
    "corpus_ccnet_buckets_kn5": 14,
    # round 15 (VERDICT r14 #6): the deterministic quantizer driver
    # sample is collected once and shared within composing queries
    # (_driver_sample); ann_recall_eval shares one corpus projection +
    # one coarse-quantizer build across its three index families, the
    # IVFPQ train half and the add-batch/compaction/streaming paths
    # collect their sample once instead of twice. Artifacts are
    # bit-identical (pure functions of the same sample); all 12
    # affected queries re-verified vs the DuckDB oracle at
    # sf0.001 + sf0.01, recall pins green:
    "ann_topk_ivf": 14,
    "ann_topk_pq": 14,
    "ann_topk_pq_deep": 14,
    "ann_topk_ivfpq": 14,
    "ann_topk_ivfpq_persisted": 14,
    "ann_topk_ivfpq_tombstoned": 14,
    "ann_index_add_batch": 14,
    "ann_index_compaction_stats": 14,
    "ann_index_rebuild_compacted": 14,
    "ann_recall_eval": 14,
    "streaming_ann_index_serve": 14,
    "streaming_ann_index_maintenance": 14,
    # round 15 (r14 advisor brief, low #2): _qcls_train now parses the
    # saved shuffle-partitions conf defensively (ValueError →
    # defaultParallelism) — value-identical on any numeric conf (this
    # harness always is); all four classifier consumers re-verified vs
    # the DuckDB oracle at sf0.001 + sf0.01 before commit
    # (corpus_ccnet_pipeline bump above already covers the fifth):
    "text_quality_classifier_train": 14,
    "text_quality_classifier_scores": 14,
    "corpus_quality_classifier_buckets": 14,
    "streaming_corpus_quality_gate": 14,
}

# _HEAVY — multi-second queries at sf0.01 (iterative ML loops, the
# DBSCAN embedding family). Sorted last within the dark set so a
# time-budget truncation can only cost these rows, never cheap ones.
_HEAVY = {
    "text_bpe_train_merges",
    "corpus_tokenizer_fertility",
    "dedup_semantic_keep_best",
    "dedup_semdedup",
    "kmeans_embeddings",
    "corpus_cluster_profiles",
    "graph_label_propagation",
    "graph_triangle_counts",
    "dbscan_embeddings",
    "dbscan_predict_holdout",
    "dbscan_embeddings_64d",
    "dbscan_predict_64d",
    "pysource_synthetic_events",
    "dbscan_flags_64d",
    "streaming_pysource_events",
    # two-phase kill/resume drains: ~20-30 s at any SF by construction
    "streaming_checkpoint_restart",
    "streaming_restart_windowed_totals",
    "streaming_ann_index_maintenance",
    "streaming_ann_index_serve",
    "streaming_corpus_quality_gate",
    # 5-level backoff cascade: big codegen plan, ~15 s cold-session
    "text_5gram_sbo_quality",
    "text_5gram_sbo_pruned",
    "corpus_ccnet_buckets_5gram",
    "text_5gram_kn_quality",
    "text_5gram_kn_pruned",
    "corpus_ccnet_buckets_kn5",
    # 5-round GD loop (10 actions over the persisted design matrix)
    "text_quality_classifier_train",
    "text_quality_classifier_scores",
    "corpus_quality_classifier_buckets",
    # composes KN5 buckets + the GD loop + LID in one query
    "corpus_ccnet_pipeline",
}


def _grading_history() -> dict[str, int]:
    """{query name: latest round with a clean driver row} from the
    CORRECTNESS_r*.json files beside this module. Rows with a real
    ``err`` don't count — an erroring query must stay in the dark set
    until a round proves it clean. ``err == "no_oracle"`` IS a clean
    row: the driver stamps it on every rows-only success (the query ran
    and produced rows; only the check is weaker), so counting it as
    dark would re-grade the same rows-only queries forever."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("err") in (
                None,
                "no_oracle",
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _oracle_backed() -> set[str]:
    out: set[str] = set()
    for mod in _operator_modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out


def _canonical_names() -> list[str]:
    """Module registration order of the QUERIES registry — the one
    ordering both queries() and oracle_sql() are sorted by (a module's
    ORACLE dict may list keys in a different order than its QUERIES)."""
    names: list[str] = []
    for mod in _operator_modules():
        names.extend(
            n for n in getattr(mod, "QUERIES", {}) if n not in names
        )
    return names


def _ordered(raw: dict) -> dict:
    """Self-rotating registration order (see REGISTRATION_ORDER above):
    ungraded `_PRIORITY` entries, then the rest of the never-graded set
    (cheap before `_HEAVY`, oracle-backed first within each), then
    graded queries — `_REGRADE` bumps first, then stalest-first."""
    graded = _grading_history()
    with_oracle = _oracle_backed()
    canon = {n: i for i, n in enumerate(_canonical_names())}
    names = sorted(raw, key=lambda n: canon.get(n, len(canon)))
    dark_priority = [n for n in _PRIORITY if n in raw and n not in graded]
    dark_rest = [
        n for n in names if n not in graded and n not in dark_priority
    ]
    dark_rest.sort(
        key=lambda n: (
            n in _HEAVY,
            n not in with_oracle,
            canon.get(n, len(canon)),
        )
    )
    green = [n for n in names if n in graded]
    green.sort(
        key=lambda n: (
            graded[n] > _REGRADE.get(n, -1),  # pending re-grades first
            graded[n],
            canon.get(n, len(canon)),
        )
    )
    out = {}
    for n in dark_priority + dark_rest + green:
        out[n] = raw[n]
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    raw: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _operator_modules():
        raw.update(getattr(mod, "QUERIES", {}))
    return _ordered(raw)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query; keys
    omitted here get the driver's weaker rows-only check."""
    raw: dict[str, str] = {}
    for mod in _operator_modules():
        raw.update(getattr(mod, "ORACLE", {}))
    return _ordered(raw)
