"""Physical-plan audits: the scale-critical plan properties each operator
family relies on must actually appear in the optimized plan — a correct
answer produced by the wrong plan (full scan instead of pushdown, shuffle
join instead of broadcast) is a bug at 100 TB even when it passes the
value check at test SF.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_TINY

import __spark_entry__ as entry_mod


def plan_of(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_TINY)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_parquet(spark):
    """scan_filter_project must push its predicate and read only the
    referenced columns (ReadSchema pruned)."""
    plan = plan_of(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan
    # column pruning: the lineitem scan must not materialize all 16 columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and read_schema[0].count(",") < 8


def test_dimension_joins_are_broadcast(spark):
    """q5 joins five dimension tables onto lineitem — every dimension side
    must be broadcast (no shuffle of the fact table per dimension)."""
    plan = plan_of(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 2


def test_q1_has_partial_aggregation(spark):
    """q1's groupBy must compile to partial (map-side) + final hash
    aggregation, and stay inside whole-stage codegen."""
    plan = plan_of(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert plan.count("Exchange") <= 2  # one shuffle for the agg (+AQE read)


def test_grouping_sets_single_expand(spark):
    """GROUPING SETS must be one Expand + aggregate, not a union of
    re-scans."""
    plan = plan_of(spark, "agg_grouping_sets")
    tree = plan.split("\n\n")[0]  # the plan tree, before the node details
    assert tree.count("Expand") == 1
    assert "Union" not in tree


def test_exists_subquery_becomes_semi_join(spark):
    """Correlated EXISTS must be unnested into a semi join, not a
    per-row subquery."""
    plan = plan_of(spark, "subquery_exists_urgent")
    assert "LeftSemi" in plan


def test_exact_dedup_no_join(spark):
    """Exact dedup is a single hash aggregate over the md5 key — any join
    in the plan means the implementation regressed."""
    plan = plan_of(spark, "dedup_exact")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_ann_bruteforce_broadcasts_queries(spark):
    """The query-vector side (10 rows) must broadcast; the corpus side
    must stream (never be collected or broadcast)."""
    plan = plan_of(spark, "ann_topk_bruteforce")
    assert "Broadcast" in plan


def test_language_id_is_zero_shuffle(spark):
    """Language ID is a pure projection argmax — any Exchange (explode +
    join + aggregate shape) is a regression; at 100 TB it must stay a
    narrow map over documents."""
    plan = plan_of(spark, "text_language_id")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_minhash_verify_never_shuffles_exploded_shingles(spark):
    """The LSH verify phase joins the tiny candidate list against the
    compact (doc_id, hs-array) table and intersects arrays row-locally.
    Exactly one aggregation pair may shuffle exploded shingle rows (the
    64-way signature min); a second one means the verify regressed to
    re-aggregating the exploded table."""
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "array_intersect" in plan
    # The verify phase sits ABOVE the cached shingle/signature subplans in
    # the tree; only the candidates .distinct() (one partial+final pair)
    # may aggregate there. Look before the first InMemoryRelation so the
    # signature aggregate inside the cache (rendered once per state, twice
    # more after AQE materializes it) never leaks into the count.
    import re

    verify_part = plan.split("InMemoryRelation")[0]
    agg_ids = set(re.findall(r"HashAggregate \((\d+)\)", verify_part))
    assert len(agg_ids) <= 2


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "agg_priority_stats",
        "window_running_total",
        "dedup_exact",
        "text_token_stats",
    ],
)
def test_no_python_udfs_in_hot_paths(spark, name):
    """The relational/dedup/text hot paths must stay JVM-side: no
    BatchEvalPython (row-at-a-time UDF) or ArrowEvalPython stages."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.fixture(scope="session")
def all_plans(spark):
    """Formatted physical plan of every registered query, built once
    per test session (building a plan runs any eager pre-passes a query
    has, so sharing the dict across global sweeps matters)."""
    return {
        name: plan_of(spark, name) for name in entry_mod.queries()
    }


def test_no_row_at_a_time_python_udfs_anywhere(all_plans):
    """Python in a plan is allowed ONLY in Arrow-batched form
    (ArrowEvalPython / mapInPandas / applyInPandas); a BatchEvalPython
    (row-at-a-time pickle UDF) anywhere is a regression."""
    for name, plan in all_plans.items():
        assert "BatchEvalPython" not in plan, name


def _single_partition_windows(plan: str) -> list[str]:
    """Node ids of Window/WindowGroupLimit operators fed by an
    ``Exchange SinglePartition`` — the "Moving all data to a single
    partition" shape."""
    sp_ids = set()
    reuses = {}  # ReusedExchange id -> referenced Exchange id
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block)
        if m and "SinglePartition" in block:
            sp_ids.add(m.group(1))
        r = re.match(r"\((\d+)\) ReusedExchange\b", block)
        if r:
            ref = re.search(r"Reuses operator id: (\d+)", block)
            if ref:
                reuses[r.group(1)] = ref.group(1)
    # a ReusedExchange pointing at a SinglePartition exchange IS that
    # exchange — a Window fed through one must still be flagged
    # (ADVICE r5: the Exchange regex alone skips ReusedExchange lines)
    sp_ids.update(rid for rid, ref in reuses.items() if ref in sp_ids)
    hits = []
    lines = plan.split("\n\n")[0].splitlines()
    # partition-preserving unary ops a Window's input chain may route
    # through before its Exchange (Sort/Project/Filter interpositions)
    _PASS = {
        "Sort",
        "Project",
        "Filter",
        "Window",
        "WindowGroupLimit",
        "ColumnarToRow",
        "InputAdapter",
        "AQEShuffleRead",
    }
    for i, ln in enumerate(lines):
        m = re.search(r"\bWindow(?:GroupLimit)? \((\d+)\)", ln)
        if not m:
            continue
        # walk the unary input chain below the Window until the
        # partition-establishing node — a fixed lookahead misses an
        # Exchange behind extra interposed nodes (ADVICE r4)
        for nxt in lines[i + 1 :]:
            em = re.search(r"\b(?:Reused)?Exchange \((\d+)\)", nxt)
            if em:
                if em.group(1) in sp_ids:
                    hits.append(m.group(1))
                break
            op = re.search(r"([A-Za-z]+) \(\d+\)", nxt)
            if not op or op.group(1) not in _PASS:
                break  # join/scan/agg boundary — chain ends unpartitioned
    return hits


#: queries whose single-partition window runs over a GENUINELY BOUNDED
#: domain (it cannot grow with the fact data), reviewed case by case —
#: everything else must use a partitioned window or
#: functions.ranking.global_order_stats
_BOUNDED_SINGLE_WINDOWS = {
    # running max over DISTINCT retail prices (fixed TPC-H price grid)
    "skyline_pareto_parts",
    # suffix max over the per-DATE aggregate (calendar-bounded: the
    # window input is #distinct dates, never the fact table)
    "skyline_orders",
    # lag/rolling over the monthly rollup (#months)
    "orders_yoy_growth",
    "orders_seasonal_decompose",
    # grand-total share over the 3-row split rollup
    "corpus_train_split",
    # rank over the 25-row per-nation rollup (fixed TPC-H dimension)
    "sql_api_nation_revenue",
}


def test_single_partition_window_sweep_sees_reused_exchange():
    """A Window fed through a ReusedExchange that references a
    SinglePartition exchange is the same single-task shape and must be
    flagged — the Exchange regex alone skips ReusedExchange tree lines
    (ADVICE r5, tests/test_plans.py sweep gap)."""
    plan = (
        "== Physical Plan ==\n"
        "* Project (6)\n"
        "+- Window (5)\n"
        "   +- Sort (4)\n"
        "      +- ReusedExchange (3)\n"
        "\n\n"
        "(3) ReusedExchange [Reuses operator id: 8]\n"
        "Output [2]: [x#1, y#2]\n"
        "\n\n"
        "(8) Exchange\n"
        "Input [2]: [x#1, y#2]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]\n"
    )
    assert _single_partition_windows(plan) == ["5"]
    # ... and a ReusedExchange over a hash-partitioned exchange stays
    # clean (no false positive from the new resolution step)
    hashed = plan.replace("SinglePartition", "hashpartitioning(x#1, 32)")
    assert _single_partition_windows(hashed) == []


def test_no_unbounded_single_partition_windows_anywhere(all_plans):
    """No registered query may funnel an unbounded-domain input through
    an unpartitioned window (one task does all the work at 100 TB).
    Exact global ranks/cumulatives must go through
    functions.ranking.global_order_stats instead (VERDICT r3 item 3)."""
    offenders = {
        name: hits
        for name, plan in all_plans.items()
        if name not in _BOUNDED_SINGLE_WINDOWS
        and (hits := _single_partition_windows(plan))
    }
    assert not offenders, offenders


#: queries whose BroadcastNestedLoopJoin is a REVIEWED BOUNDED shape —
#: every entry's broadcast side cannot grow with the fact data (or the
#: quadratic form is the documented exact baseline). Anything new that
#: plans a nested loop must be reviewed and added here consciously.
_REVIEWED_NESTED_LOOPS = {
    # 1-row scalar-aggregate broadcast (global stat / total / bucket
    # cuts crossJoined back onto the stream)
    "users_feature_assembly",
    "events_user_gini",
    "lineitem_chi2_status_flag",
    "embedding_covariance",
    "customers_rfm_segments",
    "parts_abc_analysis",
    "text_tfidf_top_terms",
    "corpus_mixture_weights",
    # 1-row m_min broadcast crossJoined onto the #sources-bounded rate
    # table (the corpus itself joins that table null-safe HASH, not
    # nested-loop)
    "corpus_sample_mixture",
    # 1-row totals broadcast crossJoined onto the ≤4096-row bucket
    # model (the feature stream joins the model by bucket HASH; only
    # the bounded model side sees the nested loop)
    "dsir_importance_weights",
    # 1-row total + 1-row partition-function broadcasts crossJoined
    # onto the #languages-bounded persisted aggregate
    "corpus_lang_temperature",
    "q22_dormant_customers",
    "q11_important_parts",
    "agg_share_of_total",
    "quality_expectations_orders",
    "text_vocab_growth",
    # global_order_stats shapes only: the 1-row percentile-cuts
    # broadcast crossJoined onto the corpus and the triangular
    # broadcast join of the #buckets-sized per-bucket totals table
    "corpus_pack_sequences",
    "text_bm25_search",
    "text_lm_quality",
    # 1-row (N, V) totals broadcast crossJoined onto the scored event
    # stream (twice: interpolated slice + the #docs-sized first-token
    # slice); the LM tables themselves join by (prev, cur) HASH
    "text_backoff_lm_quality",
    # inherits text_backoff_lm_quality's 1-row totals broadcast cross
    "corpus_ccnet_buckets",
    # 1-row (N, V) totals broadcast crossJoined onto the unigram-level
    # tail of the stupid-backoff miss cascade (r12); the LM tables
    # themselves join by n-gram HASH keys — the r13 pruned twins and
    # the order-5 family share the identical tail shape
    "text_trigram_sbo_quality",
    "corpus_ccnet_buckets_sbo",
    "text_trigram_sbo_pruned",
    "corpus_ccnet_buckets_sbo_pruned",
    "text_5gram_sbo_quality",
    "text_5gram_sbo_pruned",
    "corpus_ccnet_buckets_5gram",
    # 1-row (V, N1+(··)) continuation-totals broadcast crossJoined onto
    # the vocabulary-sized KN LM assembly and the #docs first-token
    # slice (r12); LM tables join by n-gram HASH keys — the r14
    # order-5 KN family shares the identical tail shape
    "text_trigram_kn_quality",
    "text_5gram_kn_quality",
    "text_5gram_kn_pruned",
    "corpus_ccnet_buckets_kn5",
    # composes corpus_ccnet_buckets_kn5 — every BNLJ in its plan is
    # that query's inherited 1-row totals broadcast cross (verified:
    # all 28 nodes are Cross joins whose broadcast side is a scalar
    # aggregate of LM totals; LID + classifier stages join by HASH)
    "corpus_ccnet_pipeline",
    "text_bigram_lm_quality",
    "basket_part_affinity",
    "events_ab_welch_t",
    # bounded probe/query side (fixed query vectors, box list, sampled
    # codebook, labeled seed set)
    "knn_label_predict",
    "similarity_range_search",
    "ann_topk_bruteforce",
    # bruteforce's exact shape over the image embeddings: the
    # broadcast side is the N_QUERIES=10 query rows; the non-equi
    # condition is only the self-pair exclusion
    "multimodal_embed_topk",
    # same bounded shape as bruteforce: the broadcast side is the
    # N_QUERIES=10 query rows; the non-equi condition is only the
    # self-pair exclusion
    "ann_hard_negatives",
    # composes bruteforce + ivf + pq + ivfpq: every BNLJ is an
    # inherited reviewed shape (10-query-panel broadcast); the 3×10
    # method grid is an exploded literal array, not a join
    "ann_recall_eval",
    "ann_topk_pq",
    # identical reviewed shape to ann_topk_pq (shared _pq_search body):
    # the broadcast side is the N_QUERIES=10 query rows; only the
    # re-rank depth differs
    "ann_topk_pq_deep",
    "geo_points_in_boxes",
    # DBSCAN choreography: the broadcast side is the BSP rectangle
    # table (#partitions-bounded, reference O7/O8 shape)
    "dbscan_embeddings",
    "dbscan_predict_holdout",
    "dbscan_embeddings_64d",
    "dbscan_predict_64d",
    "dbscan_flags",
    "dbscan_flags_64d",
    "dbscan_core_components",
    "dbscan_predict_canonical",
    # deliberate quadratic exact baseline (the anchor the bucketed
    # dedup_embedding_lsh path is judged against)
    "dedup_embedding_cosine",
}


def test_nested_loops_only_where_reviewed(all_plans):
    """Global sweep: no CartesianProduct anywhere, and a
    BroadcastNestedLoopJoin may appear only in queries whose nested-loop
    shape has been reviewed as bounded (see _REVIEWED_NESTED_LOOPS) — an
    unreviewed nested loop is an all-pairs scan waiting to happen at
    100 TB."""
    cart = [
        n
        for n, p in all_plans.items()
        if "CartesianProduct" in p.split("\n\n")[0]
    ]
    assert not cart, cart
    unreviewed = [
        n
        for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p.split("\n\n")[0]
        and n not in _REVIEWED_NESTED_LOOPS
    ]
    assert not unreviewed, unreviewed


def test_profile_is_single_pass_no_join(spark):
    """Table profiling must be one aggregate over one scan — a join or a
    second scan means a statistic escaped the single-pass form."""
    plan = plan_of(spark, "profile_lineitem")
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1


def test_range_join_is_keyed_not_nested_loop(spark):
    """The interval join must hash on user_id with the time range as a
    join predicate — BroadcastNestedLoopJoin/CartesianProduct would scan
    every purchase against every click at 100 TB."""
    plan = plan_of(spark, "join_range_clicks_before_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_json_csv_sources_have_no_inference_scan(spark):
    """File-source queries declare explicit schemas; their plans must
    contain exactly one scan of the mirror (schema inference would add a
    hidden extra pass at read time)."""
    for name, fmt in (("json_source_events", "Scan json"),
                      ("csv_source_events", "Scan csv")):
        tree = plan_of(spark, name).split("\n\n")[0]
        assert tree.count(fmt) == 1, name


def test_salted_join_shuffles_on_salt(spark):
    """The salted join must exchange on (event_type, salt) — salt present
    in the partitioning key is the whole point (it spreads each hot key
    over n_salt reducers) — and must NOT degrade to broadcast (the hint
    keeps the shuffle path under test)."""
    plan = plan_of(spark, "join_salted_skew")
    tree = plan.split("\n\n")[0]
    assert "ShuffledHashJoin" in tree or "SortMergeJoin" in tree, tree
    part_lines = [
        l for l in plan.splitlines()
        if "hashpartitioning" in l and "salt" in l
    ]
    assert part_lines, "no exchange partitioned by salt:\n" + plan


def test_hash_sample_is_narrow(spark):
    """Deterministic hash sampling must stay a per-row predicate: no
    shuffle, no join, single scan."""
    plan = plan_of(spark, "sample_hash_orders")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Join" not in tree, tree
    assert tree.count("Scan parquet") == 1


def test_corpus_pipeline_is_one_scan_one_exchange(spark):
    """The cleaning pipeline composes three per-row stages + a dedup: it
    must fuse to ONE documents scan and exactly ONE exchange (the
    fingerprint dedup window), with no joins — a second scan or a join
    means a stage escaped projection fusion."""
    plan = plan_of(spark, "corpus_clean_pipeline")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree, tree


def test_rolling_hash_is_narrow(spark):
    """The Karp–Rabin rolling hash is a pure per-row projection: no
    shuffle, no join, one documents scan."""
    plan = plan_of(spark, "text_rolling_hash")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Join" not in tree, tree
    assert tree.count("Scan parquet") == 1, tree


def test_unpivot_is_single_expand_no_shuffle(spark):
    """Native unpivot must compile to ONE Expand over ONE scan with no
    exchange — the wide→long melt is a narrow map at any scale."""
    plan = plan_of(spark, "unpivot_part_measures")
    tree = plan.split("\n\n")[0]
    assert tree.count("Expand") == 1, tree
    assert "Exchange" not in tree, tree
    assert tree.count("Scan parquet") == 1, tree


def test_ntile_family_single_window(spark):
    """ntile/percent_rank/cume_dist share one partitioned sort: exactly
    one Window node and one Exchange (the partitionBy shuffle) — a second
    of either means the three functions stopped sharing a frame."""
    plan = plan_of(spark, "window_ntile_deciles")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1, tree
    assert tree.count("Exchange") == 1, tree


@pytest.mark.parametrize(
    "name",
    [
        "dedup_embedding_lsh",
        "ann_topk_lsh",
        "ann_topk_ivf",
        "multimodal_phash_neardup",
    ],
)
def test_bucketed_paths_never_nested_loop(spark, name):
    """The bucketed scale paths exist to avoid the all-pairs plan; every
    join in them must be an equi (hash) join on bucket/cell/id keys. A
    CartesianProduct or BroadcastNestedLoopJoin anywhere means the
    candidate generation silently degraded to all-pairs."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_gapfill_spine_needs_only_two_scans(spark):
    """The gap-fill spine must derive from ONE single-row metadata
    aggregate (bounds + type set together), not a scan per ingredient:
    exactly two events scans — the hourly rollup and the metadata pass."""
    plan = plan_of(spark, "events_gapfill_hourly")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, tree


def test_tpch_dim_chains_broadcast(spark):
    """Q7/Q8/Q9 join 4-7 dimension tables onto lineitem; every dim side
    must ride a broadcast — a single SortMergeJoin per fact-fact pair
    (orders⋈lineitem) is the only allowed shuffle join."""
    for name in ("q7_volume_shipping", "q8_market_share", "q9_product_profit"):
        tree = plan_of(spark, name).split("\n\n")[0]
        assert tree.count("BroadcastHashJoin") >= 3, name
        assert tree.count("SortMergeJoin") <= 1, name


def test_q4_exists_is_semi_join(spark):
    """Q4's EXISTS must compile to a LeftSemi join (one output row per
    order however many lines qualify), never an inner join + distinct."""
    plan = plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "Distinct" not in plan


def test_merge_upsert_single_join(spark):
    """MERGE = exactly one full-outer join aligning snapshot and delta;
    no second pass over orders beyond building the delta slices."""
    plan = plan_of(spark, "merge_upsert_orders")
    tree = plan.split("\n\n")[0]
    assert "FullOuter" in plan
    assert tree.count("Join") == 1, tree


def test_stratified_sample_single_window(spark):
    """Per-stratum quota sampling must be ONE window (one exchange on the
    stratum key) with the rank filter applied — no join, no second agg —
    and the rank limit must push down as a WindowGroupLimit so each map
    task forwards at most 200 rows per stratum into the exchange."""
    plan = plan_of(spark, "sample_stratified_orders")
    tree = plan.split("\n\n")[0]
    assert tree.count(" Window ") == 1, tree
    assert "WindowGroupLimit" in tree, tree
    assert "Join" not in tree


def test_fuzzy_join_is_blocked_hash_join(spark):
    """The edit-distance join must hash-join on the blocking key — a
    nested-loop over the name domain means blocking silently broke."""
    plan = plan_of(spark, "fuzzy_join_part_names")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_inverted_index_single_token_shuffle(spark):
    """The postings build must partial-aggregate map-side and shuffle on
    the token key only (distinct + final agg share the token exchange)."""
    plan = plan_of(spark, "text_inverted_index")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree
    assert tree.count("Exchange") <= 3, tree


def test_sessionize_lag_single_exchange(spark):
    """Gap-sessionization must do ONE user-keyed exchange: lag window,
    running-sum window, and the per-session rollup all reuse the same
    (user_id, ts) sort and partitioning — a second exchange means the
    rollup stopped exploiting the window's output partitioning."""
    plan = plan_of(spark, "events_sessionize_lag")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert tree.count(" Window ") == 2, tree
    assert tree.count("Sort") == 1, tree


def test_contamination_corpus_side_never_shuffles_shingles(spark):
    """The corpus shingle stream must hit the broadcast probe as a pure
    map (array_distinct before explode — no exploded-table .distinct());
    only the post-match per-doc count and the tiny probe build may
    exchange, and the probe join must be a broadcast."""
    plan = plan_of(spark, "text_contamination_check")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    # Data exchanges: probe-side distinct (1), final per-doc count (1),
    # orderBy sort (1), plus AT MOST one r14 conditional round-robin
    # rebalance of the PRE-shingle corpus rows (io.rebalance_scan —
    # fires only on under-split local scans, and moves narrow
    # (doc_id, text) rows, never the exploded shingles). The budget
    # tracks whether the rebalance actually fired, so a regression
    # that sneaks in an extra non-rebalance exchange fails even in
    # configurations where the rebalance is a no-op. Partitioning
    # kinds live in the formatted plan's DETAILS section (below the
    # tree), so they are counted on the full plan text; the broadcast
    # of the tiny probe is not a data shuffle and is excluded.
    rr = plan.count("RoundRobinPartitioning")
    assert rr <= 1, plan
    data_exchanges = tree.count("Exchange") - tree.count("BroadcastExchange")
    assert data_exchanges <= 3 + rr, tree
    # the rebalance must be the round-robin kind, before the explode —
    # any hash/range exchange of the exploded stream is still a bug
    assert "hashpartitioning(s#" not in plan, plan


def test_funnel_never_cartesian(spark):
    """All funnel stage joins are user-keyed equi joins — a nested loop
    anywhere means a stage condition lost its key."""
    plan = plan_of(spark, "events_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_argmax_is_single_aggregation(spark):
    """max_by/min_by argmax must stay ONE grouped pass: no window (which
    would sort each group) and no join in the plan."""
    tree = plan_of(spark, "agg_argmax_orders").split("\n\n")[0]
    assert " Window " not in tree
    assert "Join" not in tree
    assert tree.count("HashAggregate") >= 2 or "SortAggregate" in tree


def test_quality_gate_two_scans_one_anti_join(spark):
    """The constraint gate reads orders twice (local metrics + FK check)
    and customer once, with the FK check a broadcast LEFT ANTI join."""
    tree = plan_of(spark, "quality_expectations_orders").split("\n\n")[0]
    assert "LeftAnti" in tree
    assert tree.count("Scan parquet") <= 3, tree


def test_boilerplate_membership_is_broadcast(spark):
    """The boilerplate n-gram set (small by construction) must ride a
    broadcast back onto the shingle stream — never a shuffle join of the
    corpus-sized side — and the doc-frequency agg must partial-combine."""
    plan = plan_of(spark, "corpus_boilerplate_ngrams")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_lm_quality_vocab_is_broadcast(spark):
    """The unigram LM (vocab-sized) must broadcast onto the exploded token
    stream; the token stream itself shuffles only for the doc-keyed
    score aggregation."""
    plan = plan_of(spark, "text_lm_quality")
    assert "BroadcastHashJoin" in plan
    # token stream: one exchange for the vocab agg + one for the per-doc
    # agg (+ AQE shuffle reads); a SortMergeJoin would add sorts
    assert "SortMergeJoin" not in plan


def test_quantize_stats_broadcast_no_vector_shuffle(spark):
    """int8 quantization: the per-dimension stats table (#dims rows) must
    broadcast onto the exploded value stream; only the final vec-keyed
    aggregation may exchange data-sized rows."""
    plan = plan_of(spark, "embedding_quantize_int8")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_contamination_probe_is_map_side(spark):
    """The bloom mask probe must be a pure per-row filter on the corpus
    shingle stream (literal array + bit tests inside codegen — no join,
    no exchange before the candidate filter); only the tiny exact-verify
    broadcast join and the per-doc count may exchange."""
    plan = plan_of(spark, "text_contamination_bloom")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "shiftright" in plan  # the bit tests survived into the plan
    # probe-side distinct (1 exchange), per-doc count (1), orderBy (1)
    assert tree.count("Exchange") <= 4, tree


def test_train_split_single_scan(spark):
    """The split tag is a narrow per-row projection over ONE corpus scan
    (the grand total is a window over the 3-row rollup, not a second
    scan); no joins at all."""
    plan = plan_of(spark, "corpus_train_split")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "Join" not in tree
    assert tree.count("Exchange") <= 3, tree


def test_ewma_single_exchange_no_window(spark):
    """The EWMA fold happens inside one user-keyed aggregation — one
    exchange, no Window node, no join; the sequential fold must stay a
    per-group expression, never a per-row window with growing frames."""
    plan = plan_of(spark, "events_ewma_user_value")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Window" not in tree, tree
    assert "Join" not in tree, tree


def test_scd2_shares_user_exchange(spark):
    """SCD2 run-numbering (lag + running sum), the per-run rollup, and
    the valid_to lead must all reuse ONE user-keyed exchange; the lead
    runs over the per-run rollup, not the event stream."""
    plan = plan_of(spark, "events_scd2_user_state")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree, tree


def test_triangle_counts_all_equi_joins(spark):
    """Triangle counting must stay hash/sort-merge equi-joins end to end:
    the closing-edge probe is rewritten onto an id-sorted canonical edge
    copy precisely so no OR-of-orientations predicate degrades the wedge
    close into a nested loop."""
    plan = plan_of(spark, "graph_triangle_counts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_assignment_is_zero_shuffle_map(spark):
    """The final k-means assignment (the returned plan) must be scan →
    Arrow eval → project with NO exchange: centroids travel in the UDF
    closure, never as a joined/shuffled side."""
    plan = plan_of(spark, "kmeans_embeddings")
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" in tree, tree
    assert "Exchange" not in tree, tree
    assert "Join" not in tree, tree


def test_dbscan_flags_projection_reuses_pipeline(spark):
    """dbscan_flags is a projection over the clustered result — it must
    not re-run a second containment join on the full input (one
    broadcast rect join feeding the kernel, as in the base pipeline)."""
    plan = plan_of(spark, "dbscan_flags")
    assert "CartesianProduct" not in plan


def test_ohlc_is_single_aggregation_no_window(spark):
    """events_ohlc_daily: open/close must come from min_by/max_by in the
    SAME partial-aggregated pass as high/low — one agg exchange, no
    Window node, no join."""
    plan = plan_of(spark, "events_ohlc_daily")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "Join" not in tree
    assert tree.count("Exchange") <= 1
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2


def test_skyline_is_broadcast_join_back_no_self_join(spark):
    """skyline_pareto_parts: the dominance test must be the per-price
    aggregate + running-max frame joined BACK by broadcast — never the
    O(n²) part-to-part self-join the oracle runs."""
    plan = plan_of(spark, "skyline_pareto_parts")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2  # part + per-price stats scan
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "NestedLoop" not in tree


def test_basket_pairs_expand_row_locally(spark):
    """basket_part_affinity: pair expansion must be the collect_set +
    HOF transform (Generate over the basket array) — no basket-to-basket
    or item-to-item self-join before pair counting — and all three
    consumers (pairs, item supports, order count) must reuse ONE
    persisted basket build (a single parquet scan node)."""
    import re

    plan = plan_of(spark, "basket_part_affinity")
    tree = plan.split("\n\n")[0]
    assert "Generate" in tree
    assert len(set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))) == 1
    assert "SortMergeJoin" not in tree
    # the only nested-loop is the broadcast cross of the 1-row count
    assert tree.count("BroadcastNestedLoopJoin") <= 1


def test_range_search_is_broadcast_no_sort(spark):
    """similarity_range_search: broadcast query side, no window/sort —
    the radius predicate is a plain filter over the streamed corpus."""
    plan = plan_of(spark, "similarity_range_search")
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree
    assert "Window" not in tree
    assert "Sort" not in tree.replace("SortAggregate", "")


def test_covariance_combine_is_partition_bounded(spark):
    """embedding_covariance: the data-sized stage must be ONE
    mapInPandas over the scan; everything after operates on
    #partitions × fixed-width rows (posexplode + small aggregates)."""
    import re

    plan = plan_of(spark, "embedding_covariance")
    tree = plan.split("\n\n")[0]
    # one MapInPandas node (repeated in the tree only via the cached
    # InMemoryRelation rendering) over one parquet scan
    assert len(set(re.findall(r"MapInPandas\s+\((\d+)\)", tree))) == 1
    assert len(set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))) == 1
    assert "SortMergeJoin" not in tree


def test_chunk_dedup_single_digest_exchange(spark):
    """multimodal_chunk_dedup: chunking is a row-local transform+explode;
    the only exchange is the digest-keyed aggregate."""
    plan = plan_of(spark, "multimodal_chunk_dedup")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree
    assert tree.count("Exchange") <= 2  # agg exchange (+ distinct-count expand)


def test_pii_scrub_zero_shuffle(spark):
    """text_pii_scrub: pure per-row projection — no exchange at all."""
    plan = plan_of(spark, "text_pii_scrub")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree


def test_geo_containment_is_broadcast_nested_loop(spark):
    """geo_points_in_boxes: the O8-shaped containment theta-join must be
    a BroadcastNestedLoopJoin on the tiny box side — never a cartesian
    of data-sized inputs or a shuffle."""
    plan = plan_of(spark, "geo_points_in_boxes")
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree


def test_partitioned_read_prunes_partitions(spark):
    """partitioned_prune_events: the event_type filter must land in the
    scan's PartitionFilters (directory pruning), not a post-scan
    Filter over all partitions."""
    plan = plan_of(spark, "partitioned_prune_events")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0]


def test_welch_is_single_moment_scan(spark):
    """events_ab_welch_t: the data-sized stage must be ONE grouped
    moment aggregation; the pair join runs over the tiny per-type
    table."""
    import re

    plan = plan_of(spark, "events_ab_welch_t")
    tree = plan.split("\n\n")[0]
    assert len(set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))) == 1
    assert "SortMergeJoin" not in tree


def test_seasonality_share_join_is_broadcast(spark):
    """events_seasonality_profile: the per-type totals side must
    broadcast — a full-table window over raw events would be the
    anti-pattern."""
    plan = plan_of(spark, "events_seasonality_profile")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "Window" not in tree


def test_cusum_and_holt_fold_without_joins_per_round(spark):
    """The sequential-recurrence family folds inside one aggregation —
    no per-step joins, no Window over raw events."""
    for name in ("events_cusum_alerts", "events_holt_forecast"):
        tree = plan_of(spark, name).split("\n\n")[0]
        assert "SortMergeJoin" not in tree, name
        assert "Window" not in tree, name


def test_dn_retention_all_user_keyed(spark):
    """events_dn_retention: no cartesian/nested-loop anywhere — every
    join is keyed on user_id."""
    plan = plan_of(spark, "events_dn_retention")
    tree = plan.split("\n\n")[0]
    assert "NestedLoop" not in tree
    assert "CartesianProduct" not in tree


def test_bm25_one_scan_one_broadcast_topk(spark):
    """text_bm25_search: one documents scan feeding both per-doc tf and
    the 1-row stats (reused via exchange/subplan), stats joined back by
    broadcast, final global top-k (TakeOrderedAndProject) — no
    token-stream explode, no sort-merge join."""
    plan = plan_of(spark, "text_bm25_search")
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "SortMergeJoin" not in tree
    assert "Generate" not in tree  # tf via row-local array filters


def test_seasonal_decompose_windows_over_monthly_rollup(spark):
    """orders_seasonal_decompose: windows and the seasonal join run over
    the ~80-row monthly rollup, never raw orders — exactly one
    data-sized aggregation pair in the plan."""
    plan = plan_of(spark, "orders_seasonal_decompose")
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "BroadcastHashJoin" in tree


def test_pattern_vvp_single_sort_exchange(spark):
    """events_pattern_vvp: both lags and the per-user rollup share ONE
    (user_id) exchange."""
    plan = plan_of(spark, "events_pattern_vvp")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1
    ex = [l for l in plan.splitlines() if "hashpartitioning(user_id" in l]
    assert ex, "no user-keyed exchange:\n" + plan


def test_pagerank_round_is_single_exchange(spark):
    """supplier_pagerank's iteration: with the normalized edge list
    cached hash-partitioned (and window-sorted) on s1 and ranks keyed by
    the previous round's groupBy, a round's equi-join is exchange-free on
    BOTH sides — the only shuffle a round adds is the node-keyed inflow
    sum. Audited over two chained rounds under the loop's config (AQE
    off, state-sized width) with broadcast disabled to force the
    at-scale sort-merge shape: unique shuffle exchanges == 1 cache build
    + 1 per round, and the joins compile to SortMergeJoin whose edge side
    reuses the cache's ordering."""
    from pyspark.sql import Window, functions as F

    from dbscan_spark.operators.ml import _pagerank_round

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw = spark.range(100).select(
            (F.col("id") % 10).alias("s1"),
            ((F.col("id") + 3) % 10).alias("s2"),
            F.lit(1.0).alias("w"),
        )
        ne = (
            raw.repartition(8, "s1")
            .withColumn("ow", F.sum("w").over(Window.partitionBy("s1")))
            .select("s1", "s2", (F.col("w") / F.col("ow")).alias("p"))
            .persist()
        )
        ne.count()
        ranks = (
            ne.select(F.col("s1").alias("node"))
            .distinct()
            .withColumn("rank", F.lit(0.1))
        )
        r1 = _pagerank_round(ne, ranks, 10)
        r2 = _pagerank_round(ne, r1, 10)
        plan = spark._jvm.PythonSQLUtils.explainString(
            r2._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        # the formatted tree re-prints the cached relation's build plan
        # under every InMemoryTableScan, so count UNIQUE exchange node
        # ids, not textual occurrences
        shuffles = set()
        for line in tree.splitlines():
            m = re.search(r"\bExchange \((\d+)\)", line)
            if m and "BroadcastExchange" not in line:
                shuffles.add(m.group(1))
        assert len(shuffles) == 3, tree  # cache build + one per round
        assert tree.count("SortMergeJoin") >= 2, tree
        # the cached edge side must come back sorted — each round sorts
        # only the rank side (1 row/node), never |edges| (unique ids:
        # the cache-build sort + one rank-side sort per round)
        sorts = set(re.findall(r"\bSort \((\d+)\)", tree))
        assert len(sorts) <= 1 + tree.count("SortMergeJoin"), tree
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        ne.unpersist()


def test_lpa_round_is_two_exchanges_edge_cache_reused(spark):
    """graph_label_propagation's iteration: with the edge list cached
    hash-partitioned AND sorted on s1 and labels keyed by the previous
    round's argmax groupBy, the round's equi-join is exchange-free on
    BOTH sides — a steady-state round adds exactly TWO
    label-state-bounded shuffles (the (node, label) vote sum and the
    per-node argmax; round 1 skips the vote exchange because the seed
    labels are the node ids, so label co-partitioning rides the join
    key). Audited over two chained rounds under the loop's config (AQE
    off, state-sized width, broadcast disabled to force the at-scale
    shape): unique shuffle exchanges == 1 cache build + 1 (round 1) +
    2 (round 2), the cached edge side never re-sorted, all joins
    equi-joins, no Window over the vote table."""
    from pyspark.sql import functions as F

    from dbscan_spark.operators.ml import _lpa_round

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    e = None
    try:
        raw = spark.range(100).select(
            (F.col("id") % 10).alias("s1"),
            ((F.col("id") + 3) % 10).alias("s2"),
            F.lit(1.0).alias("w"),
        )
        e = raw.repartition(8, "s1").sortWithinPartitions("s1").persist()
        e.count()
        labels = (
            e.select(F.col("s1").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        r2 = _lpa_round(e, _lpa_round(e, labels))
        plan = spark._jvm.PythonSQLUtils.explainString(
            r2._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        shuffles = set()
        for line in tree.splitlines():
            m = re.search(r"\bExchange \((\d+)\)", line)
            if m and "BroadcastExchange" not in line:
                shuffles.add(m.group(1))
        # cache build + round-1 argmax + round-2 (vote sum, argmax);
        # the seed distinct and round-1 vote sum ride the cache's s1
        # partitioning (node/label are both the s1 attribute there)
        assert len(shuffles) == 4, tree
        # the rounds' joins must be equi-joins reusing the cache
        assert "BroadcastNestedLoopJoin" not in tree, tree
        assert "CartesianProduct" not in tree, tree
        assert " Window " not in tree, tree
        # the sorted cache means no per-round |edges| re-sort: every
        # Sort in the tree belongs to a SortAggregate/label side, and
        # the InMemoryTableScans must NOT be wrapped in a Sort feeding
        # the join directly
        lines = tree.splitlines()
        for i, l in enumerate(lines):
            if "InMemoryTableScan" in l and i >= 1:
                assert "Sort" not in lines[i - 1], tree
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        if e is not None:
            e.unpersist()


def test_semantic_keep_best_broadcasts_cluster_side(spark):
    """dedup_semantic_keep_best: the documents projection is the 100 TB
    side and must stay streamed; the |near-dup docs|-sized cluster table
    is the side that broadcasts. A broadcast hint on the documents side
    works at test SF and OOMs the driver at scale (VERDICT r3 item 2)."""
    plan = plan_of(spark, "dedup_semantic_keep_best")
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    bx = [i for i, l in enumerate(lines) if "BroadcastExchange" in l]
    assert bx, tree
    # formatted tree prints the streamed (left/build-opposite) side
    # first: the parquet documents scan must appear BEFORE the
    # BroadcastExchange, never inside its subtree
    scan = [i for i, l in enumerate(lines) if "Scan parquet" in l]
    assert scan and scan[0] < bx[0], tree
    # and the broadcast subtree holds the checkpointed cluster labels
    assert any("Scan ExistingRDD" in l for l in lines[bx[0]:]), tree


def test_multimodal_quartet_zero_shuffle(spark):
    """The decoded-raster quartet (r12) must stay a row-local JVM
    payload build + ONE Arrow map — no Exchange anywhere: blob
    construction is a projection and every statistic is per-row."""
    for name in (
        "multimodal_ppm_decode",
        "multimodal_feature_extract",
        "multimodal_resize",
        "multimodal_frame_sample",
    ):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan, name
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan, name


def test_compaction_stats_one_join_one_arrow_map(spark):
    """ann_index_compaction_stats: the error map must be Arrow-batched
    (no row-at-a-time Python), the assignments⋈embeddings join hash-
    keyed on vec_id, and the final aggregate partial (map-side
    combine) — #cells rows move in the last exchange."""
    plan = plan_of(spark, "ann_index_compaction_stats")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_trigram_sbo_cascade_shape(spark):
    """text_trigram_sbo_quality: every LM join is equi-keyed (no
    cartesian products), all count aggregates are partial
    (HashAggregate), and nothing crosses a row-at-a-time Python
    boundary. (At test SF the optimizer may broadcast the tiny LM
    tables — at scale their stats exceed the threshold and the same
    equi-joins shuffle; the plan property that must hold at every SF
    is keyed-join + partial-agg, which is what this pins.)"""
    plan = plan_of(spark, "text_trigram_sbo_quality")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_5gram_sbo_cascade_shape(spark):
    """text_5gram_sbo_pruned: the order-5 cascade keeps the trigram
    core's plan contract — every LM join equi-keyed (no cartesian
    products), partial count aggregates, no row-at-a-time Python —
    with two more backoff rungs in the pipeline."""
    plan = plan_of(spark, "text_5gram_sbo_pruned")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_published_clean_c4_stage_is_projection(spark):
    """corpus_published_clean: the C4 stage must reach the documents
    scan as row-local projections/filters — the first Exchange in the
    pipeline belongs to the paragraph hash aggregate, not to any
    line-rule evaluation (no Exchange between scan and the paragraph
    posexplode)."""
    plan = plan_of(spark, "corpus_published_clean")
    assert "Exchange" in plan  # downstream stages do shuffle
    # the plan has no cartesian products and no row-at-a-time Python
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
