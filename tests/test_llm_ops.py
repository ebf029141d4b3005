"""LLM-data-pipeline operators: properties the oracle can't check —
LSH recall vs exact baselines, simhash behavior, multimodal feature values."""

from __future__ import annotations

import hashlib
import json

import pytest

from dbscan_spark.operators import dedup, multimodal, similarity
from tests.conftest import SF_SMALL, SF_TINY


def pairs(df, c1="doc1", c2="doc2"):
    return {(r[c1], r[c2]) for r in df.collect()}


def test_minhash_lsh_subset_and_recall(spark):
    """LSH output must be a subset of the exact jaccard pairs; at 32 bands
    of 2 rows the expected recall at j>=0.8 is ~1 — require 100% here."""
    exact = pairs(dedup.dedup_ngram_jaccard(spark, SF_TINY))
    lsh = pairs(dedup.dedup_minhash_lsh(spark, SF_TINY))
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) == 1.0, (len(lsh), len(exact))


def test_minhash_lsh_recall_pin_at_grading_sf(spark):
    """dedup_minhash_lsh carries an EXACT DuckDB oracle (the quadratic
    ground-truth SQL), which is only sound while banded-LSH recall is
    empirically 100% on the corpus the driver grades — sf0.01, not just
    the tiny fixture. Pin it there so a future corpus/SF change can't
    silently invalidate the exact-oracle claim (ADVICE r5). Miss prob
    per pair at j is (1-j^2)^32: ~2e-6 at the 0.8 threshold."""
    exact = pairs(dedup.dedup_ngram_jaccard(spark, SF_SMALL))
    lsh = pairs(dedup.dedup_minhash_lsh(spark, SF_SMALL))
    assert lsh <= exact
    assert exact, "grading corpus produced no near-dup pairs — drifted?"
    assert lsh == exact, (
        f"banding missed {len(exact - lsh)} of {len(exact)} pairs at the "
        "grading SF — the exact-oracle claim for dedup_minhash_lsh (and "
        "the dependent dedup_cluster_cc / dedup_semantic_keep_best / "
        "corpus_split_leakage oracles) no longer holds"
    )


def test_paragraph_neardup_crafted_fixture(spark, tmp_path):
    """corpus_paragraph_neardup on a purpose-built corpus: a one-token
    tail edit of a 20-token paragraph (jaccard 17/19 = 0.8947) pairs;
    an exact repeat collapses to one unit (stage 1's job — no pair); a
    sub-shingle paragraph and an unrelated one emit nothing."""
    import hashlib

    import pandas as pd

    from dbscan_spark.operators.dedup import corpus_paragraph_neardup

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra").split()
    para_a = " ".join(words + ["tango"])
    para_b = " ".join(words + ["zulu"])  # last token swapped
    docs = [
        (0, para_a + "\nshort one"),          # <3 tokens: no shingles
        (1, para_a + "\n" + para_b),          # exact repeat + near-dup
        (2, "completely different text about nothing shared at all "
            "with the other paragraphs in this corpus fixture row"),
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    rows = corpus_paragraph_neardup(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    md = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    ha, hb = md(para_a), md(para_b)
    rep = {ha: (0, 0), hb: (1, 1)}  # first occurrences
    h1, h2 = min(ha, hb), max(ha, hb)
    assert (r["p_hash_1"], r["p_hash_2"]) == (h1, h2)
    assert (r["doc_1"], r["pos_1"]) == rep[h1]
    assert (r["doc_2"], r["pos_2"]) == rep[h2]
    assert r["jaccard"] == pytest.approx(0.8947)


def test_paragraph_clean_composed_verdicts(spark, tmp_path):
    """corpus_paragraph_clean on a crafted corpus: exact repeats drop
    as dropped_exact; a near-dup paragraph (one-token tail edit) loses
    to the earlier first occurrence and drops EVERYWHERE as
    dropped_near; unrelated paragraphs keep; each residual md5 pinned
    to the hand-computed kept stream."""
    import hashlib

    import pandas as pd

    from dbscan_spark.operators.dedup import corpus_paragraph_clean

    md = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra").split()
    pa = " ".join(words + ["tango"])
    pb = " ".join(words + ["zulu"])  # near-dup of pa (j = 17/19)
    ux = "completely unrelated first filler paragraph here"
    uy = "another standalone second filler paragraph text"
    docs = [
        (0, pa + "\n" + ux),
        (1, pa + "\n" + pb),
        (2, pb + "\n" + uy),
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: (
            r["n_paragraphs"],
            r["n_kept"],
            r["n_dropped_exact"],
            r["n_dropped_near"],
            r["residual_hash"],
        )
        for r in corpus_paragraph_clean(spark, str(tmp_path)).collect()
    }
    want = {
        0: (2, 2, 0, 0, md(pa + "\n" + ux)),
        1: (2, 0, 1, 1, None),  # pa repeat = exact; pb loses = near
        2: (2, 1, 1, 0, md(uy)),  # pb repeat = exact; uy kept
    }
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_published_clean_stage_order(spark, tmp_path):
    """corpus_published_clean on a crafted corpus where STAGE ORDER is
    observable: (1) a paragraph whose earlier occurrence lives in a
    C4-dropped line is NOT an exact dup after C4 runs first; (2) a
    5-gram whose second occurrence lives in a paragraph the dedup stage
    drops (exact or near) is NOT a duplicated span after dedup runs
    first; (3) a genuinely cross-document 5-gram run in two kept,
    non-near-dup paragraphs IS removed on both sides; (4) a C4-dropped
    page contributes nothing downstream."""
    import pandas as pd

    from dbscan_spark.operators.dedup import corpus_published_clean

    def fillers(d):
        # unique-token keep-lines: terminal '.', 3 words, 5 sentences
        return [f"d{d}l{k}a d{d}l{k}b d{d}l{k}c." for k in range(5)]

    w20 = [f"w{i}x" for i in range(20)]
    docs = {
        1: fillers(1) + ["Shared paragraph alpha beta gamma."],
        2: fillers(2) + ["Shared paragraph alpha beta gamma."],
        3: fillers(3) + ["orphan boilerplate zeta eta theta"],
        4: fillers(4) + ["Orphan boilerplate zeta eta theta!"],
        5: fillers(5) + ["Common run one two three four five six end."],
        6: fillers(6)
        + ["Different intro common run one two three four five six "
           "finale."],
        7: ["This page has a brace { inside."] + fillers(7),
        8: fillers(8) + [" ".join(w20) + "."],
        9: fillers(9) + [" ".join(w20[:19] + ["zzz9"]) + "."],
    }
    pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": ["\n".join(v) for v in docs.values()],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len("\n".join(v)) for v in docs.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_published_clean(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(docs)
    # (4) the brace page fails C4 page-keep; zeros downstream
    assert got[7]["c4_keep"] is False
    assert got[7]["n_paragraphs"] == 0 and got[7]["n_tokens"] == 0
    assert got[7]["final_md5"] is None
    # every other page survives C4 with 6 lines
    for d in (1, 2, 4, 5, 6, 8, 9):
        assert got[d]["c4_keep"] is True and got[d]["n_lines"] == 6
        assert got[d]["n_lines_kept"] == 6
    # doc 3: the orphan line lacks terminal punctuation -> line-dropped
    assert got[3]["n_lines"] == 6 and got[3]["n_lines_kept"] == 5
    # exact paragraph dedup: doc 2's shared paragraph loses to doc 1
    assert got[1]["n_para_kept"] == 6
    assert got[2]["n_para_dropped_exact"] == 1
    assert got[2]["n_para_kept"] == 5
    # (1) ORDER: doc 3's copy died in stage 1, so doc 4's paragraph is
    # the FIRST occurrence and keeps (raw-order would drop it)
    assert got[4]["n_para_dropped_exact"] == 0
    assert got[4]["n_para_kept"] == 6
    # near-dup: doc 9's one-token tail edit (j = 17/19) loses to doc 8
    assert got[9]["n_para_dropped_near"] == 1
    assert got[8]["n_para_kept"] == 6
    # (2) ORDER: the shared 5-grams' second copies died in stage 2, so
    # no span is duplicated for docs 1 and 8 (raw-order would remove)
    assert got[1]["n_tokens_removed"] == 0
    assert got[8]["n_tokens_removed"] == 0
    assert got[2]["n_tokens_removed"] == 0
    assert got[9]["n_tokens_removed"] == 0
    # (3) the genuinely duplicated 8-token run is removed on BOTH sides
    assert got[5]["n_tokens_removed"] == 8
    assert got[6]["n_tokens_removed"] == 8
    for d in (1, 2, 3, 4, 5, 6, 8, 9):
        assert got[d]["final_md5"] is not None
    # attrition arithmetic holds per row
    for d, r in got.items():
        assert r["n_paragraphs"] == (
            r["n_para_kept"]
            + r["n_para_dropped_exact"]
            + r["n_para_dropped_near"]
        )
        assert r["n_tokens"] == r["n_tokens_kept"] + r["n_tokens_removed"]


def test_paragraph_neardup_recall_pin_at_grading_sf(spark):
    """corpus_paragraph_neardup carries an EXACT DuckDB oracle (the
    quadratic all-pairs SQL over distinct normalized paragraphs) —
    sound only while banded recall is empirically 100% at the SF the
    driver grades. Same discipline as the dedup_minhash_lsh pin; miss
    prob per pair at j=0.8 is (1-j²)³² ≈ 2e-6."""
    import duckdb

    from dbscan_spark.operators.dedup import (
        ORACLE,
        corpus_paragraph_neardup,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"FROM '{SF_SMALL}/documents.parquet'"
    )
    truth = {
        (r[0], r[1])
        for r in con.sql(
            ORACLE["corpus_paragraph_neardup"]
        ).fetchall()
    }
    got = {
        (r["p_hash_1"], r["p_hash_2"])
        for r in corpus_paragraph_neardup(spark, SF_SMALL).collect()
    }
    assert got <= truth, "verified pairs must be a ground-truth subset"
    assert truth, "grading corpus produced no near-dup paragraphs"
    assert got == truth, (
        f"banding missed {len(truth - got)} of {len(truth)} paragraph "
        "pairs at the grading SF — the exact-oracle claim no longer holds"
    )


def test_embedding_lsh_subset_and_recall(spark):
    """The LSH-bucketed near-dup path must emit a verified subset of the
    exact all-pairs baseline; worst-case per-pair catch probability at the
    0.4 cosine boundary is ~0.75 with 8 tables x 4 planes (measured 0.82
    at sf0.001) — pin well below at 0.6."""
    exact = pairs(dedup.dedup_embedding_cosine(spark, SF_TINY), "vec_id_1", "vec_id_2")
    lsh = pairs(dedup.dedup_embedding_lsh(spark, SF_TINY), "vec_id_1", "vec_id_2")
    assert lsh <= exact
    assert exact, "baseline found no pairs — fixture drifted"
    assert len(lsh) / len(exact) >= 0.6, (len(lsh), len(exact))


def test_ivfpq_persisted_index_parity(spark, tmp_path):
    """write_ivfpq_index → read_ivfpq_index → probe must return exactly
    the fresh in-session ann_topk_ivfpq result (deterministic training)
    — the claim that lets ann_topk_ivfpq_persisted share the exact
    train-replay oracle. Also: a dir without the completeness marker
    must refuse to load (a partial index can never be probed)."""
    from dbscan_spark.operators import similarity as sim

    key = lambda r: (  # noqa: E731
        r["query_id"],
        r["rnk"],
        r["neighbor_id"],
        r["cos_sim"],
    )
    fresh = {key(r) for r in sim.ann_topk_ivfpq(spark, SF_TINY).collect()}
    with pytest.raises(FileNotFoundError):
        sim.read_ivfpq_index(spark, str(tmp_path))
    sim.write_ivfpq_index(spark, SF_TINY, str(tmp_path))
    cent, books, assigns = sim.read_ivfpq_index(spark, str(tmp_path))
    e = sim._embeddings_with_norms(spark, SF_TINY)
    corpus = assigns.join(e, "vec_id").select(
        "vec_id", "v", "nv", "cell", "codes"
    )
    persisted = {
        key(r)
        for r in sim._ivfpq_probe(spark, e, cent, books, corpus).collect()
    }
    assert persisted == fresh
    assert fresh, "ivfpq returned no rows — fixture drifted"


def test_ivfpq_tombstoned_parity_and_exclusion(spark):
    """Tombstoned probe: (a) filtering the PERSISTED index equals
    filtering a fresh frozen-training encode of the corpus — deletion
    is an index-row filter, never a retrain; (b) no tombstoned vec_id
    ever appears as a neighbor; (c) query vectors stay un-tombstoned
    (external queries may still probe a store that deleted them)."""
    import hashlib

    from pyspark.sql import functions as F

    from dbscan_spark.operators import similarity as sim

    key = lambda r: (  # noqa: E731
        r["query_id"],
        r["rnk"],
        r["neighbor_id"],
        r["cos_sim"],
    )
    got = sim.ann_topk_ivfpq_tombstoned(spark, SF_TINY).collect()
    dead = {
        r["vec_id"]
        for r in sim._embeddings_with_norms(spark, SF_TINY)
        .select("vec_id")
        .collect()
        if hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[0] in "01"
    }
    assert dead, "fixture drifted — empty tombstone slice"
    assert not {r["neighbor_id"] for r in got} & dead
    assert {r["query_id"] for r in got} == set(range(sim.N_QUERIES))
    e, cent, books, corpus = sim._ivfpq_train_encode(spark, SF_TINY)
    fresh_live = corpus.filter(
        ~sim._tombstoned(F.col("vec_id"))
    )
    fresh = {
        key(r)
        for r in sim._ivfpq_probe(
            spark, e, cent, books, fresh_live
        ).collect()
    }
    assert {key(r) for r in got} == fresh
    assert fresh, "tombstoned probe returned no rows"


def test_ann_index_compaction_stats_invariants(spark):
    """Compaction stats: per-cell counts reconcile with the corpus and
    the deterministic tombstone slice; live_frac/rebuild agree; the
    error stat is a nonnegative exact integer with a consistent mean;
    two runs are identical (pure function of corpus + frozen index)."""
    import hashlib

    from dbscan_spark.operators import similarity as sim

    rows = sim.ann_index_compaction_stats(spark, SF_TINY).collect()
    e_ids = {
        r["vec_id"]
        for r in sim._embeddings_with_norms(spark, SF_TINY)
        .select("vec_id")
        .collect()
    }
    dead = {
        v
        for v in e_ids
        if hashlib.md5(str(v).encode()).hexdigest()[0] in "01"
    }
    assert sum(r["n_total"] for r in rows) == len(e_ids)
    assert sum(r["n_dead"] for r in rows) == len(dead)
    for r in rows:
        assert r["n_total"] == r["n_live"] + r["n_dead"]
        assert r["sum_err_q"] >= 0
        want_frac = (
            int(r["n_live"] / r["n_total"] * 10000 + 0.5) / 10000
        )
        assert r["live_frac"] == pytest.approx(want_frac)
        assert r["rebuild"] == (r["live_frac"] < sim._REBUILD_LIVE_FRAC)
        if r["n_live"] > 0:
            assert r["mean_err_live"] is not None
    again = {
        tuple(r)
        for r in sim.ann_index_compaction_stats(spark, SF_TINY).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_ann_index_rebuild_compacted_contract(spark):
    """ann_index_rebuild_compacted: the compacted index holds exactly
    the live (non-tombstoned) vec_ids — compaction is physical, not a
    filter; cells/codes lie in the trained ranges; two runs are
    identical (pure function of the corpus + the deterministic
    tombstone slice)."""
    import hashlib

    from dbscan_spark.operators import similarity as sim

    e_ids = {
        r["vec_id"]
        for r in sim._embeddings_with_norms(spark, SF_TINY)
        .select("vec_id")
        .collect()
    }
    live = {
        v
        for v in e_ids
        if hashlib.md5(str(v).encode()).hexdigest()[0] not in "01"
    }
    rows = sim.ann_index_rebuild_compacted(spark, SF_TINY).collect()
    assert {r["vec_id"] for r in rows} == live
    assert live < e_ids, "fixture drifted — empty tombstone slice"
    for r in rows:
        assert 0 <= r["cell"] < sim._IVF_CELLS
        for m in range(sim._PQ_M):
            assert 0 <= r[f"c{m}"] < sim._PQ_K
    again = {
        tuple(r)
        for r in sim.ann_index_rebuild_compacted(spark, SF_TINY).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_ann_index_add_batch_contract(spark):
    """ann_index_add_batch: output rows are exactly the deterministic
    md5-incoming slice (disjoint from the training slice), every cell
    and code lies in the trained ranges, and two runs are identical —
    the add path must be a pure function of the corpus."""
    import hashlib

    from dbscan_spark.operators import similarity as sim

    e = sim._embeddings_with_norms(spark, SF_TINY)
    all_ids = {r["vec_id"] for r in e.select("vec_id").collect()}
    want_incoming = {
        v
        for v in all_ids
        if hashlib.md5(str(v).encode()).hexdigest()[0] in "ef"
    }
    rows = sim.ann_index_add_batch(spark, SF_TINY).collect()
    got = {r["vec_id"] for r in rows}
    assert got == want_incoming
    assert want_incoming, "fixture drifted — no incoming slice"
    for r in rows:
        assert 0 <= r["cell"] < sim._IVF_CELLS
        for m in range(sim._PQ_M):
            assert 0 <= r[f"c{m}"] < sim._PQ_K
    again = {
        tuple(r) for r in sim.ann_index_add_batch(spark, SF_TINY).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_pair_cosine_matches_jvm_fold(spark):
    """The Arrow pair-cosine kernel must agree with the JVM aggregate()
    fold to float64 tolerance on arbitrary vector pairs (summation order
    differs — einsum vs sequential fold — so exact bit equality is not
    guaranteed, but any real divergence means a broken kernel)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dbscan_spark.functions import cosine
    from dbscan_spark.operators.similarity import pair_cosine

    rng = np.random.default_rng(7)
    rows = [
        (i, rng.normal(size=64).tolist(), rng.normal(size=64).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>"
    )
    got = (
        df.select(
            pair_cosine(F.col("a"), F.col("b")).alias("arrow"),
            cosine(F.col("a"), F.col("b")).alias("jvm"),
        )
        .toPandas()
    )
    assert np.allclose(got["arrow"], got["jvm"], atol=1e-12, rtol=1e-12)


def test_minhash_signature_shape(spark):
    row = dedup.minhash_signatures(spark, SF_TINY).first()
    assert len(row["sig"]) == 64


def test_embedding_lsh_prunes_near_dup_corpus(spark):
    """The LSH scale-pruning property, measured: on a seeded near-dup
    corpus (each base vector gets one perturbed twin at cosine ≈ 0.97),
    deep tables (8×8 planes) at a 0.9 verify threshold must pass ≤5% of
    all pairs as candidates while recovering ≥90% of the true twin pairs.
    This is the regime embedding-LSH dedup exists for — the registered
    0.4-threshold query on the near-orthogonal corpus documents why its
    candidate fraction is necessarily large there."""
    import numpy as np
    from pyspark.sql import functions as F

    from dbscan_spark.functions import l2_norm
    from dbscan_spark.operators.dedup import (
        _embedding_lsh_candidates,
        _embedding_lsh_pairs,
    )

    base = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ]
    )
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    n = len(base)
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(base.shape)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    twins = base + 0.25 * noise  # cosine(base, twin) ≈ 0.97
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)

    rows = [(i, base[i].tolist()) for i in range(n)] + [
        (i + n, twins[i].tolist()) for i in range(n)
    ]
    e = (
        spark.createDataFrame(rows, "vec_id long, v array<double>")
        .withColumn("nv", l2_norm(F.col("v")))
    )

    n_cand = _embedding_lsh_candidates(e, 8, 8).count()
    all_pairs = (2 * n) * (2 * n - 1) // 2
    frac = n_cand / all_pairs
    assert frac <= 0.05, f"candidate fraction {frac:.3f} exceeds 5% ceiling"

    true_pairs = {
        (i, i + n)
        for i in range(n)
        if round(float(base[i] @ twins[i]), 4) >= 0.9
    }
    assert len(true_pairs) >= 0.9 * n, "perturbation too strong — bad seed?"
    got = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in _embedding_lsh_pairs(e, 0.9, 8, 8).collect()
    }
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"near-dup recall {recall:.3f} below 0.9"


def test_simhash_finds_identical_token_bags(spark):
    """Docs with identical token *bags* have identical simhash (hamming 0),
    so every unigram-jaccard==1.0 pair must appear in dedup_simhash output.
    (Precision vs n-gram jaccard is NOT asserted: simhash encodes unigram
    bags, and weak-signal collisions are inherent on a tiny vocabulary.)"""
    from pyspark.sql import functions as F

    from dbscan_spark.functions import tokens
    from dbscan_spark.io import load_table

    d = load_table(spark, SF_TINY, "documents").select(
        "doc_id",
        F.array_sort(F.array_distinct(tokens(F.col("text")))).alias("bag"),
        tokens(F.col("text")).alias("toks"),
    )
    a, b = d.alias("a"), d.alias("b")
    # identical multisets: same sorted distinct bag AND same sorted full list
    same_bag = {
        (r["d1"], r["d2"])
        for r in a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.bag") == F.col("b.bag"))
            & (
                F.array_sort(F.col("a.toks")) == F.array_sort(F.col("b.toks"))
            ),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .collect()
    }
    sim = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in dedup.dedup_simhash(spark, SF_TINY).collect()
    }
    for p in same_bag:
        assert p in sim and sim[p] == 0, f"identical-bag pair {p} missed"
    assert all(0 <= h <= 3 for h in sim.values())


def test_simhash_deterministic(spark):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, SF_TINY).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, SF_TINY).collect()}
    assert a == b


def test_ann_lsh_recall(spark):
    """LSH ANN must recover a healthy fraction of the true top-5 sets."""
    bf = similarity.ann_topk_bruteforce(spark, SF_TINY)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    approx = similarity.ann_topk_lsh(spark, SF_TINY)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert truth, "brute force returned nothing"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ann_recall_eval_matches_set_overlap(spark):
    """The graded recall harness must equal the set-overlap recall
    computed here independently per method, cover the full 3×10
    (method, query) grid, and rank ivfpq >= pq on corpus average
    (residual quantization refines the coarse cells)."""
    rows = similarity.ann_recall_eval(spark, SF_TINY).collect()
    assert len(rows) == 30
    got = {(r["method"], r["query_id"]): (r["n_hits"], r["recall_at_5"]) for r in rows}
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_bruteforce(spark, SF_TINY).collect()
    }
    for method, fn in (
        ("ivf", similarity.ann_topk_ivf),
        ("pq", similarity.ann_topk_pq),
        ("ivfpq", similarity.ann_topk_ivfpq),
    ):
        ap = {
            (r["query_id"], r["neighbor_id"])
            for r in fn(spark, SF_TINY).collect()
        }
        for q in {q for q, _ in bf}:
            n = len({p for p in ap & bf if p[0] == q})
            assert got[(method, q)] == (n, round(n / 5.0, 4)), (method, q)
    mean = lambda m: sum(v[1] for (mm, _), v in got.items() if mm == m) / 10
    assert mean("ivfpq") >= mean("pq")


def test_pack_sequences_contiguous_stream(spark):
    """Packing invariants: doc offsets tile the virtual token stream
    exactly (offset_0 = 0, offset_{i+1} = offset_i + n_tokens_i in
    doc_id order), sequence ids match the offset arithmetic, and the
    two-level bucket prefix-sum equals a directly computed running
    total."""
    from dbscan_spark.operators import text as text_ops

    rows = sorted(
        text_ops.corpus_pack_sequences(spark, SF_TINY).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows and rows[0]["tok_offset"] == 0
    run = 0
    for r in rows:
        assert r["tok_offset"] == run, r["doc_id"]
        assert r["n_tokens"] >= 1  # EOS guarantees every doc occupies space
        assert r["seq_first"] == r["tok_offset"] // 2048
        assert r["seq_last"] == (r["tok_offset"] + r["n_tokens"] - 1) // 2048
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1 >= 1
        run += r["n_tokens"]


def _doc_rasters(spark):
    """doc_id -> the zero-padded (h, 16, 3) raster each multimodal query
    decodes (the reference computation, built directly in numpy)."""
    import numpy as np

    out = {}
    for r in spark.read.parquet(f"{SF_TINY}/documents.parquet").collect():
        if r["text"] is None:
            continue
        raw = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        h = max(1, -(-len(raw) // 48))
        img = np.zeros(h * 48, dtype=np.uint8)
        img[: len(raw)] = raw
        out[r["doc_id"]] = img.reshape(h, 16, 3)
    return out


def test_multimodal_features_match_numpy(spark):
    """Decoded-raster features equal a direct numpy computation on the
    padded raster (r12: stats run on decode_image's pixels, not the raw
    byte stream — padding mass lands in histogram bucket 0)."""
    import numpy as np

    rows = multimodal.multimodal_feature_extract(spark, SF_TINY).collect()
    rasters = _doc_rasters(spark)
    assert len(rows) == len(rasters)
    for r in rows[:20]:
        img = rasters[r["doc_id"]]
        flat = img.reshape(-1)
        assert r["height"] == img.shape[0]
        assert r["n_bytes"] == flat.size
        assert r["byte_mean"] == pytest.approx(
            float(np.floor(float(flat.mean()) * 10000 + 0.5)) / 10000
        )
        histo = json.loads(r["histo16"])  # emitted as canonical JSON string
        assert histo == list(np.bincount(flat >> 4, minlength=16))
        assert sum(histo) == r["n_bytes"]


def test_multimodal_frame_sample_matches_numpy(spark):
    """Sampled frames equal the parsed raster's rows: ≤4 evenly spaced
    rows per doc, correct offsets/sizes/channel sums/means, first row
    always sampled, tail reached on tall rasters."""
    import numpy as np

    rows = multimodal.multimodal_frame_sample(spark, SF_TINY).collect()
    rasters = _doc_rasters(spark)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(rasters)
    for doc_id, frames in list(by_doc.items())[:20]:
        img = rasters[doc_id].astype(np.int64)
        n_frames = img.shape[0]
        assert 1 <= len(frames) <= 4
        frames.sort(key=lambda f: f["frame_idx"])
        assert frames[0]["frame_idx"] == 0  # first frame always sampled
        for fr in frames:
            assert fr["byte_offset"] == fr["frame_idx"] * 48
            assert fr["n_bytes"] == 48
            row = img[fr["frame_idx"]]
            ch = row.sum(0)
            assert (fr["sum_r"], fr["sum_g"], fr["sum_b"]) == tuple(
                int(c) for c in ch
            )
            want = (
                float(np.floor(int(ch.sum()) / 48 * 10000 + 0.5)) / 10000
            )
            assert fr["byte_mean"] == pytest.approx(want)
        if n_frames > 4:
            # uniform sampling must reach past the midpoint of the raster
            assert max(f["frame_idx"] for f in frames) >= n_frames // 2


def test_multimodal_resize_matches_numpy(spark):
    """Block-average thumbnails equal a direct numpy resize of the
    parsed raster; short docs (h < 4) produce NULL cells for empty row
    blocks on the Spark side too."""
    import hashlib

    import numpy as np

    rows = multimodal.multimodal_resize(spark, SF_TINY).collect()
    rasters = _doc_rasters(spark)
    assert {r["doc_id"] for r in rows} == set(rasters)
    for r in rows[:20]:
        img = rasters[r["doc_id"]].astype(np.int64)
        h = img.shape[0]
        assert r["height"] == h
        assert r["n_bytes"] == img.size
        cells = []
        for tr in range(4):
            lo, hi = (tr * h) // 4, ((tr + 1) * h) // 4
            for tc in range(4):
                cnt = (hi - lo) * 4
                for ch in range(3):
                    if cnt == 0:
                        cells.append(None)
                        continue
                    s = int(img[lo:hi, 4 * tc : 4 * tc + 4, ch].sum())
                    cells.append(
                        float((20000 * s + cnt) // (2 * cnt)) / 10000.0
                    )
        joined = ",".join(
            "null" if c is None else f"{c:.4f}" for c in cells
        )
        assert r["thumb_md5"] == hashlib.md5(joined.encode()).hexdigest()
        assert r["thumb_first"] == cells[0]
        assert r["thumb_last"] == cells[-1]


def test_phash_neardup_recall_vs_bruteforce(spark):
    """multimodal_phash_neardup: the banded candidate join must emit
    EXACTLY the brute-force all-pairs hamming ≤ 2 set over the same
    36-bit dHash (recall 1 is structural — 3 bands, ≤2 flipped bits
    leave ≥1 band intact; precision 1 because the verify is exact) —
    recomputed here from the decoded rasters with independent python
    bit math, fixture must contain at least one near-dup pair."""
    import numpy as np

    rows = multimodal.multimodal_phash_neardup(spark, SF_TINY).collect()
    got = {(r["doc1"], r["doc2"]): r["hamming"] for r in rows}
    rasters = _doc_rasters(spark)
    sig = {}
    for doc_id, img in rasters.items():
        img = img.astype(np.int64)
        h = img.shape[0]
        val = 0
        for tr in range(4):
            lo, hi = (tr * h) // 4, ((tr + 1) * h) // 4
            for tc in range(3):
                for ch in range(3):
                    a = int(img[lo:hi, 4 * tc : 4 * tc + 4, ch].sum())
                    b = int(
                        img[lo:hi, 4 * tc + 4 : 4 * tc + 8, ch].sum()
                    )
                    if a > b:
                        val |= 1 << (ch * 12 + tr * 3 + tc)
        sig[doc_id] = val
    ids = sorted(sig)
    want = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            hm = bin(sig[d1] ^ sig[d2]).count("1")
            if hm <= 2:
                want[(d1, d2)] = hm
    assert want, "fixture has no phash near-dup pair — drifted?"
    assert got == want


def test_phash_constant_image_corpus_bound(spark, tmp_path):
    """VERDICT r13 #4 hot-bucket pin: a corpus of byte-identical
    documents (→ byte-identical thumbnails → ONE shared 36-bit phash,
    every band bucket degenerate-hot) must (a) still produce the exact
    all-pairs hamming-0 result, and (b) keep the BANDED join bounded
    by DISTINCT hashes — zero hash pairs here, so the quadratic work
    is only the output-sized equality expansion. Structural check:
    the band posexplode runs over hash-only rows (no doc_id below the
    Generate), i.e. the distinct-hash collapse is in the plan, not
    just in this fixture's luck."""
    import pandas as pd

    n_dup = 40
    texts = ["constant thumbnail block image bytes"] * n_dup + [
        "a completely different document body with other words",
        "yet another distinct text payload row for the corpus",
    ]
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    df = multimodal.multimodal_phash_neardup(spark, str(tmp_path))
    # (b) plan: every Generate (band explode) input is hash-only
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen_lines, "band posexplode missing from the plan"
    assert all("doc_id" not in ln for ln in gen_lines), gen_lines
    # (a) output: exactly C(40,2) hamming-0 pairs among the identical
    # block; the two distinct docs are far (>2 bits) from everything
    rows = df.collect()
    got = {(r["doc1"], r["doc2"]): r["hamming"] for r in rows}
    want = {
        (d1, d2): 0
        for d1 in range(n_dup)
        for d2 in range(d1 + 1, n_dup)
    }
    assert got == want, (len(got), len(want))
    # (b) volume: the distinct-hash pair table itself is EMPTY for
    # this corpus — the banded join emits nothing to expand
    from pyspark.sql import functions as F

    hashes = spark.createDataFrame(
        [(h,) for h in {0, 1, 2}], "phash long"
    )  # smoke the helper shape on a tiny literal table too
    assert multimodal._phash_hash_pairs(hashes).columns == [
        "h1",
        "h2",
        "hamming",
    ]


def test_decode_image_ppm_pgm():
    """decode_image is a real netpbm parser since r11: P6/P5 payloads
    with comments and ragged header whitespace decode to the exact
    pixel grid; non-netpbm magic, oversized maxval, and truncated
    payloads are rejected."""
    import numpy as np

    px = bytes(range(2 * 3 * 3))  # 3x2 RGB
    img = multimodal.decode_image(b"P6\n# a comment\n 3  2\n255\n" + px)
    assert img.shape == (2, 3, 3)
    assert img.tobytes() == px
    gray = bytes(range(12))  # 4x3 grayscale
    g = multimodal.decode_image(b"P5 4 3 255 " + gray)
    assert g.shape == (3, 4)
    assert g.tobytes() == gray
    # trailing bytes beyond the raster are ignored (count= honors need)
    img2 = multimodal.decode_image(b"P6\n3 2\n255\n" + px + b"extra")
    assert np.array_equal(img2, img)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff")  # JPEG magic
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P3\n1 1\n255\n1 2 3")  # ASCII ppm
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n1 1\n65535\n\x00\x00")  # 16-bit
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n4 4\n255\n\x00")  # truncated


def test_fingerprint_order_insensitive(spark):
    """Same token bag in different order → same fingerprint (by construction:
    md5 over sorted distinct tokens)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_fp_docs")
    from dbscan_spark.functions import tokens
    from pyspark.sql import functions as F

    fp = df.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
        ).alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r["fp"] for r in fp}
    assert by_id[1] == by_id[2] != by_id[3]
    # cross-check against hashlib on the known token bag
    expected = hashlib.md5(b"alpha beta gamma").hexdigest()
    assert by_id[1] == expected


def test_approx_count_distinct_within_tolerance(spark):
    """The HLL++ sketch must track the exact distinct count within 5% on
    every group — the query emits that comparison as a boolean so the
    driver hash (oracle emits TRUE) grades it; assert it holds here too."""
    from dbscan_spark.operators.relational import agg_approx_distinct
    from tests.conftest import SF_TINY

    rows = agg_approx_distinct(spark, SF_TINY).collect()
    assert rows
    for r in rows:
        assert r["exact_orders"] > 0
        assert r["approx_within_5pct"] is True, r


def test_approx_percentiles_track_exact(spark):
    """Sketch quantiles must land within 1% relative rank error of the
    exact interpolated quantiles on every group (rows-only driver check,
    so accuracy is pinned here)."""
    from dbscan_spark.operators.relational import (
        agg_approx_percentiles,
        agg_percentiles,
    )
    from tests.conftest import SF_TINY

    exact = {r["l_returnflag"]: r for r in agg_percentiles(spark, SF_TINY).collect()}
    approx = {
        r["l_returnflag"]: r for r in agg_approx_percentiles(spark, SF_TINY).collect()
    }
    assert set(exact) == set(approx) and exact
    for flag, e in exact.items():
        a = approx[flag]
        # the query's exact columns must equal agg_percentiles' values,
        # and its in-query sketch-vs-exact comparison must hold
        for col in ("q25", "median_qty", "q75", "p90_price"):
            assert a[col] == pytest.approx(e[col]), (flag, col)
        assert a["sketch_within_1pct"] is True, flag


def test_multimodal_embed_deterministic_and_channelled(spark):
    """The decoded-raster encoder (r12) must be deterministic,
    L2-normalized, and genuinely per-channel: the 24-dim vector equals
    a direct numpy per-channel histogram of the padded raster."""
    import numpy as np

    cols = [f"e{i}" for i in range(24)]
    a = {r["doc_id"]: tuple(r[c] for c in cols)
         for r in multimodal.multimodal_embed(spark, SF_TINY).collect()}
    b = {r["doc_id"]: tuple(r[c] for c in cols)
         for r in multimodal.multimodal_embed(spark, SF_TINY).collect()}
    assert a == b and len(a) > 0
    rasters = _doc_rasters(spark)
    assert set(a) == set(rasters)
    for doc_id, got in list(a.items())[:20]:
        img = rasters[doc_id]
        hist = np.stack(
            [
                np.bincount(img[:, :, ch].reshape(-1) >> 5, minlength=8)
                for ch in range(3)
            ]
        )
        flat = hist.reshape(-1).astype(np.float64)
        n = float(np.sqrt((flat * flat).sum()))
        want = tuple(np.floor(flat / n * 1e6 + 0.5) / 1e6)
        assert got == want, doc_id
    v = np.array(next(iter(a.values())))
    assert len(v) == 24 and abs(np.linalg.norm(v) - 1.0) < 1e-4


def test_ann_ivf_recall(spark):
    """IVF ANN (16-cell coarse quantizer, 4 probes) must recover a healthy
    fraction of the true top-5 sets and emit exactly 5 rows per query."""
    bf = similarity.ann_topk_bruteforce(spark, SF_TINY)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    rows = similarity.ann_topk_ivf(spark, SF_TINY).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    from collections import Counter
    per_q = Counter(r["query_id"] for r in rows)
    assert all(v == 5 for v in per_q.values()), per_q
    recall = len(got & truth) / len(truth)
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_dedup_cluster_cc_matches_union_find(spark):
    """The iterative min-label propagation must produce EXACTLY the
    connected components a driver-side union-find derives from the same
    verified pair list (canonical label = min doc_id per component)."""
    pair_list = [
        (r["doc1"], r["doc2"])
        for r in dedup.dedup_minhash_lsh(spark, SF_TINY).collect()
    ]
    assert pair_list, "fixture produced no near-dup pairs"
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller so every final
            # root is the component's min id, matching the operator
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_cluster_cc(spark, SF_TINY).collect()
    }
    assert got == want


def test_phash_clusters_match_union_find(spark):
    """multimodal_phash_clusters: the min-label fixpoint over the
    verified phash pair graph must equal a driver-side union-find with
    min-root attachment over the SAME pairs (the dedup_cluster_cc pin,
    image side)."""
    pair_list = [
        (r["doc1"], r["doc2"])
        for r in multimodal.multimodal_phash_neardup(
            spark, SF_TINY
        ).collect()
    ]
    assert pair_list, "fixture produced no phash near-dup pairs"
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in multimodal.multimodal_phash_clusters(
            spark, SF_TINY
        ).collect()
    }
    assert got == want


def test_phash_keep_best_survivor_invariants(spark):
    """multimodal_phash_keep_best: exactly one survivor per cluster
    (its own id, drop=False), every survivor has the cluster's max
    raster height (ties to min doc_id), every non-survivor is marked
    drop, and the clustered doc set equals multimodal_phash_clusters'."""
    rows = multimodal.multimodal_phash_keep_best(spark, SF_TINY).collect()
    assert rows, "fixture produced no clustered images"
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in multimodal.multimodal_phash_clusters(
            spark, SF_TINY
        ).collect()
    }
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == clusters
    heights = {
        r["doc_id"]: max(
            1, -(-len((r["text"] or "").encode("utf-8")) // 48)
        )
        for r in spark.read.parquet(
            f"{SF_TINY}/documents.parquet"
        ).collect()
        if r["text"] is not None
    }
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rs in by_cluster.items():
        survivors = [r for r in rs if not r["drop"]]
        assert len(survivors) == 1, cid
        s = survivors[0]
        assert s["doc_id"] == s["survivor_id"] == rs[0]["survivor_id"]
        assert all(r["survivor_id"] == s["doc_id"] for r in rs)
        assert all(r["drop"] for r in rs if r["doc_id"] != s["doc_id"])
        best = min(
            (( -heights[r["doc_id"]], r["doc_id"]) for r in rs)
        )
        assert s["doc_id"] == best[1], cid


def test_heavy_hitters_exactly_true_set(spark):
    """Sketch-pruned + exact-verified heavy hitters must equal the true
    heavy-hitter set exactly: freqItems guarantees no false negatives
    above its support, and the exact-share filter (threshold strictly
    above the support) removes the sketch's false positives."""
    from dbscan_spark.operators import relational
    from pyspark.sql import functions as F

    got = {
        r["l_partkey"]
        for r in relational.agg_heavy_hitters(spark, SF_TINY).collect()
    }
    l = relational._t(spark, SF_TINY, "lineitem")
    total = l.count()
    true_hh = {
        r["l_partkey"]
        for r in l.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") / total > relational._HH_THRESHOLD)
        .collect()
    }
    assert got == true_hh, (true_hh - got, got - true_hh)
    assert true_hh, "threshold too high: no true heavy hitters at sf0.001"


def test_ann_pq_recall(spark):
    """PQ+ADC with exact top-32 re-rank must recover most of the true
    top-5 sets (re-ranking bounds the damage of quantization error) and
    emit exactly 5 rows per query."""
    bf = similarity.ann_topk_bruteforce(spark, SF_TINY)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    rows = similarity.ann_topk_pq(spark, SF_TINY).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    from collections import Counter

    per_q = Counter(r["query_id"] for r in rows)
    assert all(v == 5 for v in per_q.values()), per_q
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"PQ recall too low: {recall}"


def test_co_order_pair_cap_drops_super_orders(spark):
    """The S² skew guard: an order with more suppliers than the cap must
    contribute zero pair rows, while small orders are unaffected and the
    uncapped build keeps the quadratic expansion."""
    from dbscan_spark.operators.ml import _co_order_pairs

    rows = [(1, s) for s in range(50)]  # super-order: 50 suppliers
    rows += [(2, 100), (2, 101), (3, 100), (3, 101), (4, 200)]
    so = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")

    capped = _co_order_pairs(so, max_suppliers_per_order=10).collect()
    assert {(r["s1"], r["s2"], r["w"]) for r in capped} == {(100, 101, 2)}

    uncapped = _co_order_pairs(so, max_suppliers_per_order=None)
    assert uncapped.count() == 50 * 49 // 2 + 1


def test_pagerank_matches_power_iteration(spark):
    """Every distributed PageRank value must match a driver-side numpy
    power iteration on the same weighted graph to 1e-6 (same damping,
    same iteration count, same dangling handling)."""
    import numpy as np

    from dbscan_spark.operators import ml
    from pyspark.sql import functions as F

    got = {
        r["s_suppkey"]: r["pagerank"]
        for r in ml.supplier_pagerank(spark, SF_TINY).collect()
    }
    assert got, "empty graph"
    from dbscan_spark.io import load_table

    l = load_table(spark, SF_TINY, "lineitem")
    so = l.select("l_orderkey", "l_suppkey").distinct().collect()
    from collections import defaultdict

    by_order = defaultdict(list)
    for r in so:
        by_order[r["l_orderkey"]].append(r["l_suppkey"])
    w = defaultdict(int)
    for supps in by_order.values():
        ss = sorted(set(supps))
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                w[(ss[i], ss[j])] += 1
                w[(ss[j], ss[i])] += 1
    nodes = sorted({k[0] for k in w})
    idx = {n: i for i, n in enumerate(nodes)}
    P = np.zeros((len(nodes), len(nodes)))
    for (s1, s2), wt in w.items():
        P[idx[s1], idx[s2]] = wt
    P = P / P.sum(1, keepdims=True)
    d, n = 0.85, len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - d) / n + d * (P.T @ r)
    want = {node: r[i] for node, i in idx.items()}
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-6, (
            node,
            got[node],
            want[node],
        )


def test_ann_ivfpq_recall(spark):
    """IVFPQ (4-probe coarse quantizer + residual PQ + exact top-32
    re-rank) must recover a healthy fraction of the true top-5 sets;
    recall is bounded above by the IVF probe recall, so the floor sits
    at the IVF level, and exactly 5 rows emit per query."""
    bf = similarity.ann_topk_bruteforce(spark, SF_TINY)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    rows = similarity.ann_topk_ivfpq(spark, SF_TINY).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    from collections import Counter

    per_q = Counter(r["query_id"] for r in rows)
    assert all(v == 5 for v in per_q.values()), per_q
    recall = len(got & truth) / len(truth)
    assert recall >= 0.35, f"IVFPQ recall too low: {recall}"


def test_winnowing_guarantee_and_degenerates(spark, tmp_path):
    """Winnowing's defining property (Schleimer et al. 2003): any shared
    run of t = k + w - 1 = 6 tokens must contribute at least one COMMON
    selected fingerprint. Plus the degenerate contracts: identical docs
    share the signature, and a doc with fewer than w grams selects
    nothing (empty-set signature)."""
    import hashlib

    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    shared = "alpha beta gamma delta epsilon zeta"   # 6-token run
    texts = [
        "x1 x2 x3 " + shared + " x4 x5",             # 0: run in context A
        "y1 " + shared + " y2 y3 y4 y5 y6",          # 1: run in context B
        "x1 x2 x3 " + shared + " x4 x5",             # 2: identical to 0
        "a b c d e",                                  # 3: 3 grams < w=4
        "q",                                          # 4: no gram at all
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    rows = {
        r["doc_id"]: r
        for r in text_ops.text_winnow_fingerprints(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[0]["winnow_sig"] == rows[2]["winnow_sig"]
    assert rows[0]["n_fingerprints"] == rows[2]["n_fingerprints"] > 0
    empty_sig = hashlib.md5(b"").hexdigest()
    assert rows[3] ["n_fingerprints"] == 0
    assert rows[3]["winnow_sig"] == empty_sig and rows[3]["n_grams"] == 3
    assert rows[4]["n_grams"] == 0 and rows[4]["winnow_sig"] == empty_sig

    # the t-token guarantee: docs 0 and 1 share >= 1 selected hash.
    # Re-derive the selected hash SETS from the engine's own gram
    # hashing by intersecting signatures is impossible (md5 of the
    # set), so check via a third doc that is EXACTLY the shared run:
    # every one of its grams lies inside the shared run, and winnowing
    # selects a subset — any selected hash of doc 5 is a gram hash both
    # docs 0 and 1 contain; the guarantee says docs 0 and 1 each
    # selected at least one gram OF THE RUN. Verify by checking the
    # run-only doc's fingerprint count is positive and the runs inside
    # docs 0/1 did select run grams: remove the run from doc 0's text
    # and the signature must change (a run gram was load-bearing).
    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["x1 x2 x3 x4 x5"],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [14],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    without_run = text_ops.text_winnow_fingerprints(
        spark, str(tmp_path)
    ).collect()[0]
    assert without_run["winnow_sig"] != rows[0]["winnow_sig"]


def test_backoff_lm_interpolation_numpy(spark, tmp_path):
    """text_backoff_lm_quality vs a direct numpy replay on a tiny
    corpus: per-event λ=3/4 interpolation of Laplace bigram/unigram
    models, first token scored by the pure unigram — including the
    1-token doc the conditional-only bigram query would drop."""
    import numpy as np
    import pandas as pd

    from dbscan_spark.operators.text import text_backoff_lm_quality

    texts = ["a b a c", "b a b", "z"]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    docs = [t.split() for t in texts]
    toks = [w for d in docs for w in d]
    n_tot, vocab = len(toks), sorted(set(toks))
    v = len(vocab)
    cu = {w: toks.count(w) for w in vocab}
    bigrams = [
        (d[i - 1], d[i]) for d in docs for i in range(1, len(d))
    ]
    cb: dict = {}
    for pr, c in bigrams:
        cb[(pr, c)] = cb.get((pr, c), 0) + 1
    cp = {pr: sum(n for (p2, _), n in cb.items() if p2 == pr)
          for pr, _ in cb}
    want = {}
    for i, d in enumerate(docs):
        nlls = []
        for j, w in enumerate(d):
            if j == 0:
                p = (cu[w] + 1) / (n_tot + v)
            else:
                a, b = cb[(d[j - 1], w)] + 1, cp[d[j - 1]] + v
                c_, D = cu[w] + 1, n_tot + v
                p = (3 * a * D + b * c_) / (4 * b * D)
            nlls.append(-np.log(p))
        want[i] = (
            len(d),
            float(np.floor(np.mean(nlls) * 10000 + 0.5)) / 10000,
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in text_backoff_lm_quality(spark, str(tmp_path)).collect()
    }
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_trigram_sbo_backoff_telemetry(spark):
    """text_trigram_sbo_quality: the LM trains on the md5 < 'e' doc
    slice and scores ALL docs, so (a) every doc appears with finite
    nll and reconciling level counts; (b) train-slice docs with ≥3
    tokens score every i≥3 event at the trigram level (they count
    themselves); (c) the HELD-OUT slice genuinely exercises backoff
    (some bigram/unigram events corpus-wide); two runs identical."""
    import hashlib
    import math

    from dbscan_spark.operators import text as text_ops

    rows = text_ops.text_trigram_sbo_quality(spark, SF_TINY).collect()
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(
            f"{SF_TINY}/documents.parquet"
        ).collect()
        if r["text"] is not None
    }
    assert {r["doc_id"] for r in rows} == docs
    held = {
        d
        for d in docs
        if hashlib.md5(str(d).encode()).hexdigest()[0] in "ef"
    }
    assert held and held < docs, "fixture drifted — degenerate split"
    backoff_events = 0
    for r in rows:
        assert r["nll"] is not None and math.isfinite(r["nll"])
        assert r["nll"] > 0
        assert (
            r["n_tokens"]
            == r["n_tri_hits"] + r["n_big_hits"] + r["n_uni_events"]
        )
        if r["doc_id"] not in held and r["n_tokens"] >= 3:
            # train docs: every trigram event counts itself
            assert r["n_tri_hits"] == r["n_tokens"] - 2
        if r["doc_id"] in held:
            backoff_events += r["n_big_hits"] + r["n_uni_events"]
    assert backoff_events > 0, "held-out slice never backed off"
    again = {
        tuple(r)
        for r in text_ops.text_trigram_sbo_quality(
            spark, SF_TINY
        ).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_trigram_sbo_pruned_backoff_absorption(spark):
    """text_trigram_sbo_pruned vs the unpruned twin: pruning drops
    entries from the LOOKUP tables only, so per event it can only push
    scoring DOWN the backoff chain — (a) token counts identical,
    (b) tri hits (and tri+big hits) monotonically non-increasing,
    (c) a doc whose per-level telemetry is unchanged kept every event
    at its level, and since retained entries keep raw counts its nll
    is bit-identical, (d) pruning actually bites on the fixture."""
    from dbscan_spark.operators import text as text_ops

    base = {
        r["doc_id"]: r
        for r in text_ops.text_trigram_sbo_quality(spark, SF_TINY).collect()
    }
    pruned = {
        r["doc_id"]: r
        for r in text_ops.text_trigram_sbo_pruned(spark, SF_TINY).collect()
    }
    assert set(base) == set(pruned)
    moved = 0
    for d, p in pruned.items():
        b = base[d]
        assert p["n_tokens"] == b["n_tokens"]
        assert p["n_tri_hits"] <= b["n_tri_hits"]
        assert (
            p["n_tri_hits"] + p["n_big_hits"]
            <= b["n_tri_hits"] + b["n_big_hits"]
        )
        if (p["n_tri_hits"], p["n_big_hits"]) == (
            b["n_tri_hits"],
            b["n_big_hits"],
        ):
            assert p["nll"] == b["nll"], d
        else:
            moved += 1
    assert moved > 0, "pruning never bit — fixture degenerate"


def test_5gram_sbo_backoff_telemetry_and_pruned_absorption(spark):
    """text_5gram_sbo_quality / text_5gram_sbo_pruned: (a) every doc
    scores with finite positive nll and level counts reconciling to
    n_tokens across all FIVE levels; (b) train docs with ≥5 tokens hit
    the 5-gram level on every i≥5 event in the UNPRUNED LM (they count
    themselves); (c) held-out docs genuinely back off; (d) pruning can
    only push events DOWN the chain (every hit-level prefix sum
    non-increasing) and bites on the fixture; (e) a doc with unchanged
    telemetry keeps a bit-identical nll."""
    import hashlib
    import math

    from dbscan_spark.operators import text as text_ops

    base = {
        r["doc_id"]: r
        for r in text_ops.text_5gram_sbo_quality(spark, SF_TINY).collect()
    }
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(
            f"{SF_TINY}/documents.parquet"
        ).collect()
        if r["text"] is not None
    }
    assert set(base) == docs
    held = {
        d
        for d in docs
        if hashlib.md5(str(d).encode()).hexdigest()[0] in "ef"
    }
    backoff_events = 0
    for d, r in base.items():
        assert r["nll"] is not None and math.isfinite(r["nll"])
        assert r["nll"] > 0
        assert r["n_tokens"] == (
            r["n_5_hits"]
            + r["n_4_hits"]
            + r["n_tri_hits"]
            + r["n_big_hits"]
            + r["n_uni_events"]
        )
        if d not in held and r["n_tokens"] >= 5:
            assert r["n_5_hits"] == r["n_tokens"] - 4
        if d in held:
            backoff_events += r["n_tokens"] - r["n_5_hits"]
    assert backoff_events > 0, "held-out slice never backed off"
    pruned = {
        r["doc_id"]: r
        for r in text_ops.text_5gram_sbo_pruned(spark, SF_TINY).collect()
    }
    assert set(pruned) == docs
    moved = 0
    levels = ["n_5_hits", "n_4_hits", "n_tri_hits", "n_big_hits"]
    for d, p in pruned.items():
        b = base[d]
        assert p["n_tokens"] == b["n_tokens"]
        acc_p = acc_b = 0
        for lv in levels:
            acc_p += p[lv]
            acc_b += b[lv]
            assert acc_p <= acc_b, (d, lv)
        if all(p[lv] == b[lv] for lv in levels):
            assert p["nll"] == b["nll"], d
        else:
            moved += 1
    assert moved > 0, "5-gram pruning never bit — fixture degenerate"


def test_ccnet_buckets_sbo_pruned_rides_pruned_score(spark):
    """corpus_ccnet_buckets_sbo_pruned: the bucket column must be the
    exact per-language ntile(3) over the PRUNED score (nll ASC, doc_id
    ASC), and the emitted nll must equal text_trigram_sbo_pruned's —
    score fidelity survives the pruning knob end-to-end."""
    from dbscan_spark.operators import text as text_ops

    rows = text_ops.corpus_ccnet_buckets_sbo_pruned(
        spark, SF_TINY
    ).collect()
    want = {
        r["doc_id"]: r["nll"]
        for r in text_ops.text_trigram_sbo_pruned(spark, SF_TINY).collect()
    }
    assert {r["doc_id"]: r["nll"] for r in rows} == want
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["nll"], r["doc_id"]))
        q, rem = divmod(len(rs), 3)
        sizes = [q + (1 if i < rem else 0) for i in range(3)]
        expect = (
            ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
        )
        assert [r["bucket"] for r in rs] == expect, lang


def test_5gram_kn_quality_contract_and_pruned_fallback(spark):
    """text_5gram_kn_quality / text_5gram_kn_pruned: (a) every
    non-null-text doc scores with finite positive nll, the right token
    count, zero pruned-event telemetry, and n_5_hits == n_tokens − 4
    for every doc long enough (corpus-trained interpolation: every
    i≥5 event hits its own 5-gram); (b) the KN score genuinely
    disagrees with the raw-frequency 5-gram SBO score (the
    continuation-count machinery is not degenerate); (c) pruning moves
    events to the backoff-only branch (n_5_hits + n_pruned_events
    conserves the unpruned top-level count), bites on the fixture, and
    a doc with no pruned events keeps a bit-identical nll."""
    import math

    from dbscan_spark.operators import text as text_ops

    base = {
        r["doc_id"]: r
        for r in text_ops.text_5gram_kn_quality(spark, SF_TINY).collect()
    }
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(
            f"{SF_TINY}/documents.parquet"
        ).collect()
        if r["text"] is not None
    }
    assert set(base) == docs
    for r in base.values():
        assert r["nll"] is not None and math.isfinite(r["nll"])
        assert r["nll"] > 0
        assert r["n_pruned_events"] == 0
        assert r["n_5_hits"] == max(r["n_tokens"] - 4, 0)
    sbo = {
        r["doc_id"]: r["nll"]
        for r in text_ops.text_5gram_sbo_quality(spark, SF_TINY).collect()
    }
    assert any(abs(base[d]["nll"] - sbo[d]) > 1e-3 for d in base)
    pruned = {
        r["doc_id"]: r
        for r in text_ops.text_5gram_kn_pruned(spark, SF_TINY).collect()
    }
    assert set(pruned) == docs
    bit = 0
    for d, p in pruned.items():
        b = base[d]
        assert p["n_tokens"] == b["n_tokens"]
        assert p["n_5_hits"] + p["n_pruned_events"] == b["n_5_hits"], d
        if p["n_pruned_events"] == 0:
            assert p["nll"] == b["nll"], d
        else:
            bit += 1
    assert bit > 0, "5-gram KN pruning never bit — fixture degenerate"


def test_ccnet_buckets_kn5_rides_pruned_kn_score(spark):
    """corpus_ccnet_buckets_kn5: the bucket column must be the exact
    per-language ntile(3) over the PRUNED order-5 KN score (nll ASC,
    doc_id ASC), and the emitted nll must equal
    text_5gram_kn_pruned's — the shipped-CCNet-recipe composition is
    score-faithful end to end."""
    from dbscan_spark.operators import text as text_ops

    rows = text_ops.corpus_ccnet_buckets_kn5(spark, SF_TINY).collect()
    want = {
        r["doc_id"]: r["nll"]
        for r in text_ops.text_5gram_kn_pruned(spark, SF_TINY).collect()
    }
    assert {r["doc_id"]: r["nll"] for r in rows} == want
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["nll"], r["doc_id"]))
        q, rem = divmod(len(rs), 3)
        sizes = [q + (1 if i < rem else 0) for i in range(3)]
        expect = (
            ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
        )
        assert [r["bucket"] for r in rs] == expect, lang


def test_trigram_kn_quality_contract(spark):
    """text_trigram_kn_quality: every non-null-text doc scores with a
    finite positive nll and the right token count (interpolation
    touches every order on every event — nothing can hit a zero
    probability thanks to the +1 continuation base); two runs are
    identical; and the continuation-count signature holds on the
    corpus: a doc's nll differs from the raw-frequency stupid-backoff
    score (the two estimators genuinely disagree, i.e. the KN
    machinery is not silently degenerate)."""
    import math

    from dbscan_spark.operators import text as text_ops

    rows = text_ops.text_trigram_kn_quality(spark, SF_TINY).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            f"{SF_TINY}/documents.parquet"
        ).collect()
        if r["text"] is not None
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    for r in rows:
        assert r["nll"] is not None and math.isfinite(r["nll"])
        assert r["nll"] > 0
        assert r["n_tokens"] >= 1
    sbo = {
        r["doc_id"]: r["nll"]
        for r in text_ops.text_trigram_sbo_quality(
            spark, SF_TINY
        ).collect()
    }
    kn = {r["doc_id"]: r["nll"] for r in rows}
    assert any(abs(kn[d] - sbo[d]) > 1e-3 for d in kn)
    again = {
        tuple(r)
        for r in text_ops.text_trigram_kn_quality(spark, SF_TINY).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_ccnet_buckets_sbo_tercile_rule(spark):
    """corpus_ccnet_buckets_sbo: the factored bucketizer must cut exact
    per-language ntile(3) thirds over the stupid-backoff score, same
    rule as the backoff-LM buckets."""
    from collections import Counter

    from dbscan_spark.operators import text as text_ops

    rows = text_ops.corpus_ccnet_buckets_sbo(spark, SF_TINY).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(
            (r["nll"], r["doc_id"], r["bucket"])
        )
    assert by_lang, "no buckets emitted"
    for lang, entries in by_lang.items():
        entries.sort()
        n = len(entries)
        base, extra = divmod(n, 3)
        sizes = Counter(b for _, _, b in entries)
        want = {
            "head": base + (1 if extra >= 1 else 0),
            "middle": base + (1 if extra >= 2 else 0),
            "tail": base,
        }
        assert {k: sizes.get(k, 0) for k in want} == want, lang
        order = {"head": 0, "middle": 1, "tail": 2}
        labels = [order[b] for _, _, b in entries]
        assert labels == sorted(labels), lang


def test_ccnet_buckets_tercile_rule(spark):
    """corpus_ccnet_buckets: within each language the buckets must be
    ntile(3) thirds of the (nll, doc_id) order — head sizes >= middle
    >= tail with at most 1 difference, and max(nll) of head <= min(nll)
    of middle <= ... up to the single tie the doc_id split can cut."""
    from collections import Counter

    from dbscan_spark.operators import text as text_ops

    rows = text_ops.corpus_ccnet_buckets(spark, SF_TINY).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(
            (r["nll"], r["doc_id"], r["bucket"])
        )
    for lang, entries in by_lang.items():
        entries.sort()
        n = len(entries)
        base, extra = divmod(n, 3)
        sizes = Counter(b for _, _, b in entries)
        want = {
            "head": base + (1 if extra >= 1 else 0),
            "middle": base + (1 if extra >= 2 else 0),
            "tail": base,
        }
        assert {k: v for k, v in sizes.items() if v} == {
            k: v for k, v in want.items() if v
        }, lang
        # the sorted order must be exactly head*, middle*, tail*
        order = [b for _, _, b in entries]
        assert order == ["head"] * want["head"] + ["middle"] * want[
            "middle"
        ] + ["tail"] * want["tail"], lang


def test_tokenizer_fertility_consistent_with_bpe_encode(spark):
    """corpus_tokenizer_fertility must be exactly the per-language
    rollup of text_bpe_encode's per-doc token budgets (same trained
    merges, same vocabulary encoding) — and fertility can never dip
    below 1 (a word is at least one token)."""
    from collections import defaultdict

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import text as text_ops

    per_doc = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in text_ops.text_bpe_encode(spark, SF_TINY).collect()
    }
    lang_of = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, SF_TINY, "documents").collect()
    }
    want = defaultdict(lambda: [0, 0])
    for doc_id, (n_w, n_b) in per_doc.items():
        want[lang_of[doc_id]][0] += n_w
        want[lang_of[doc_id]][1] += n_b
    got = {
        r["lang"]: (r["n_words"], r["n_bpe_tokens"], r["fertility"])
        for r in text_ops.corpus_tokenizer_fertility(
            spark, SF_TINY
        ).collect()
    }
    # langs whose every doc tokenizes to nothing have no word rows
    assert set(got) == {k for k, v in want.items() if v[0] > 0}
    import math

    for lang, (n_w, n_b, fert) in got.items():
        assert (n_w, n_b) == tuple(want[lang]), lang
        assert fert >= 1.0
        assert fert == math.floor(n_b / n_w * 10000 + 0.5) / 10000


def test_hard_negative_threshold_pins_dedup_band():
    """ADVICE r9: HARD_NEG_DUP_THRESHOLD intentionally duplicates
    dedup.COSINE_DEDUP_THRESHOLD (keeps similarity.py import-independent
    of dedup.py); this pin turns any future one-sided move into a test
    failure instead of a silently diverged near-dup band."""
    assert similarity.HARD_NEG_DUP_THRESHOLD == dedup.COSINE_DEDUP_THRESHOLD


def test_hard_negatives_band_and_rank(spark):
    """ann_hard_negatives: no returned neighbor may sit in the near-dup
    band, ranks are contiguous top-k, and the set matches a numpy
    re-derivation of \"highest cosine below the band\" per query."""
    import numpy as np

    from dbscan_spark.operators import similarity as sim

    rows = sim.ann_hard_negatives(spark, SF_TINY).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(
            f"{SF_TINY}/embeddings.parquet"
        ).collect()
    }
    by_q = {}
    for r in rows:
        assert r["cos_sim"] < sim.HARD_NEG_DUP_THRESHOLD
        by_q.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["cos_sim"])
        )
    for qid, entries in by_q.items():
        entries.sort()
        assert [e[0] for e in entries] == list(
            range(1, len(entries) + 1)
        )
        qv = emb[qid]
        cand = []
        for nid, v in emb.items():
            if nid == qid:
                continue
            c = round(
                float(qv @ v)
                / (np.linalg.norm(qv) * np.linalg.norm(v)),
                4,
            )
            if c < sim.HARD_NEG_DUP_THRESHOLD:
                cand.append((-c, nid))
        cand.sort()
        want = [nid for _, nid in cand[: len(entries)]]
        assert [e[1] for e in entries] == want, qid


def test_semdedup_keep_rule(spark, tmp_path):
    """dedup_semdedup on a crafted 4-d corpus: recompute the spec in
    numpy from the query's own cluster/cent_sim outputs and assert the
    published keep rule — a vector is dropped iff some EARLIER-ranked
    (lowest centroid-similarity first) member of its cluster sits at
    cosine >= the threshold, so every surviving pair is below it."""
    import itertools

    import numpy as np
    import pandas as pd

    from dbscan_spark.operators import dedup

    vecs = [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, -1],
        [1, 0.05, 0, 0],      # near-dup of 0
        [0.95, 0.1, 0, 0],    # near-dup of 0 and 8
        [0, 1, 0.02, 0],      # near-dup of 1
        [0.1, 0.1, 0.1, 0.1],  # diffuse, above-threshold to several
    ]
    pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
            "label": [0] * len(vecs),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    rows = {
        r["vec_id"]: (r["cluster"], r["cent_sim"], r["drop"])
        for r in dedup.dedup_semdedup(spark, str(tmp_path)).collect()
    }
    assert len(rows) == len(vecs)
    V = np.array(vecs, dtype=np.float64)
    cos = lambda i, j: round(  # noqa: E731
        float(V[i] @ V[j])
        / (np.linalg.norm(V[i]) * np.linalg.norm(V[j])),
        4,
    )
    # at least one genuine duplicate must be exercised
    assert any(dropped for _, _, dropped in rows.values())
    for c in {cl for cl, _, _ in rows.values()}:
        member_rank = sorted(
            (cs, vid) for vid, (cl, cs, _) in rows.items() if cl == c
        )
        order = [vid for _, vid in member_rank]
        for pos, vid in enumerate(order):
            want_drop = any(
                cos(vid, prev) >= dedup.COSINE_DEDUP_THRESHOLD
                for prev in order[:pos]
            )
            assert rows[vid][2] == want_drop, (vid, rows[vid])
        kept = [v for v in order if not rows[v][2]]
        for i, j in itertools.combinations(kept, 2):
            assert cos(i, j) < dedup.COSINE_DEDUP_THRESHOLD, (i, j)


def test_semantic_keep_best_survivor_rule(spark):
    """Within every duplicate cluster exactly ONE doc survives, it is the
    longest (doc_id tie-break), and every other member is marked drop."""
    rows = dedup.dedup_semantic_keep_best(spark, SF_TINY).collect()
    assert rows, "no clustered docs"
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in dedup.load_table(spark, SF_TINY, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if not m["drop"]]
        assert len(keepers) == 1, (cid, members)
        best = min(
            members, key=lambda m: (-n_chars[m["doc_id"]], m["doc_id"])
        )
        assert keepers[0]["doc_id"] == best["doc_id"]
        assert all(m["survivor_id"] == best["doc_id"] for m in members)


def test_bloom_contamination_no_false_negatives_and_prunes(spark):
    """The bloom prefilter must pass every truly-contaminated shingle
    (bloom no-FN property → output equals the exact operator, which the
    oracle also checks) and must prune: false-positive shingles that
    survive the mask but fail exact verification must be under 1% of the
    distinct non-matching corpus shingles."""
    from dbscan_spark.operators import text

    probe, candidates = text._bloom_probe_and_candidates(spark, SF_TINY)
    probe_set = {r["ps"] for r in probe.collect()}
    cand = [(r["doc_id"], r["s"]) for r in candidates.collect()]
    cand_set = set(cand)

    d = text.load_table(spark, SF_TINY, "documents")
    from pyspark.sql import functions as F

    all_sh = {
        (r["doc_id"], r["s"])
        for r in d.filter(F.col("doc_id") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    text.shingles(text.tokens(F.col("text")))
                )
            ).alias("s"),
        )
        .collect()
    }
    true_hits = {(doc, s) for doc, s in all_sh if s in probe_set}
    assert true_hits <= cand_set, "bloom dropped a true match (FN!)"
    non_matching = all_sh - true_hits
    fps = cand_set - true_hits
    if non_matching:
        fp_rate = len(fps) / len(non_matching)
        assert fp_rate < 0.01, (len(fps), len(non_matching))


def test_train_split_deterministic_and_partitions(spark):
    """Same assignment on rerun, every doc in exactly one split, and the
    split fractions near the designed 240/8/8 bucket weights."""
    from dbscan_spark.operators import text

    a = {
        r["split"]: (r["n_docs"], r["n_tokens"])
        for r in text.corpus_train_split(spark, SF_TINY).collect()
    }
    b = {
        r["split"]: (r["n_docs"], r["n_tokens"])
        for r in text.corpus_train_split(spark, SF_TINY).collect()
    }
    assert a == b
    total = sum(n for n, _ in a.values())
    n_total = text.load_table(spark, SF_TINY, "documents").count()
    assert total == n_total  # exactly one split per doc
    assert a["train"][0] / total > 0.85


def test_kmeans_matches_numpy_lloyd(spark):
    """Every k-means assignment must match an independent driver-side
    numpy Lloyd run with the same spec: vectors 0..k-1 init, 5 rounds,
    per-round floor-half-up 1e-4 centroid quantization, argmin ties to
    the lowest cluster id, empty clusters carrying the old centroid."""
    import math

    import numpy as np

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import ml

    got = {
        r["vec_id"]: r["cluster"]
        for r in ml.kmeans_embeddings(spark, SF_TINY).collect()
    }
    rows = (
        load_table(spark, SF_TINY, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([[float(x) for x in r["embedding"]] for r in rows])
    order = np.argsort(ids)
    ids, V = ids[order], V[order]

    def quant(a):
        return np.floor(a * 10000 + 0.5) / 10000

    cent = quant(V[ids < ml._KM_K][np.argsort(ids[ids < ml._KM_K])])
    for _ in range(ml._KM_ITERS):
        d2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        new = cent.copy()
        for c in range(ml._KM_K):
            if (a == c).any():
                new[c] = quant(V[a == c].mean(0))
        cent = new
    final = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1)
    want = dict(zip(ids.tolist(), final.tolist()))
    assert got == want


def test_triangle_counts_match_bruteforce(spark):
    """Per-node triangle counts from the degree-oriented wedge join must
    equal brute-force enumeration over the collected edge set."""
    from itertools import combinations

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import ml

    got = {
        r["s_suppkey"]: (r["degree"], r["triangles"])
        for r in ml.graph_triangle_counts(spark, SF_TINY).collect()
    }
    l = load_table(spark, SF_TINY, "lineitem")
    pairs = ml._co_order_pairs(
        l.select("l_orderkey", "l_suppkey")
    ).collect()
    edges = {(r["s1"], r["s2"]) for r in pairs}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if (min(a, b), max(a, b)) in edges:
                tri[n] += 1
    want = {n: (len(adj[n]), tri[n]) for n in adj}
    assert got == want


def test_pca_2d_matches_numpy(spark):
    """embedding_pca_2d's projections must match a full numpy PCA
    (population covariance → eigh → top-2, identical sign rule) to
    4dp — and be invariant across runs (the Gram-partial summation
    order must not leak into the rounded output)."""
    import numpy as np

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import ml

    rows = load_table(spark, SF_TINY, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    m = np.array([[float(x) for x in r["embedding"]] for r in rows])
    mean = m.mean(axis=0)
    cov = (m - mean).T @ (m - mean) / len(m)
    _, vecs = np.linalg.eigh(cov)
    comps = []
    for k in (1, 2):
        v = vecs[:, -k]
        pivot = int(np.argmax(np.abs(np.round(v, 12))))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
    proj = (m - mean) @ np.stack(comps).T
    want = {i: (round(p[0], 4), round(p[1], 4)) for i, p in zip(ids, proj)}
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in ml.embedding_pca_2d(spark, SF_TINY).collect()
    }
    assert len(got) == len(want)
    for i in want:
        assert abs(got[i][0] - want[i][0]) <= 2e-4, i
        assert abs(got[i][1] - want[i][1]) <= 2e-4, i


def test_bfs_reach_matches_python_bfs(spark):
    """graph_bfs_reach's (node, min_hops) set must equal a driver-side
    BFS over the same co-order edge set."""
    from collections import deque

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import ml

    got = {
        r["suppkey"]: r["min_hops"]
        for r in ml.graph_bfs_reach(spark, SF_TINY).collect()
    }
    l = load_table(spark, SF_TINY, "lineitem")
    pairs = ml._co_order_pairs(
        l.select("l_orderkey", "l_suppkey")
    ).collect()
    adj: dict[int, set[int]] = {}
    for r in pairs:
        adj.setdefault(r["s1"], set()).add(r["s2"])
        adj.setdefault(r["s2"], set()).add(r["s1"])
    seed = min(adj)
    want = {seed: 0}
    q = deque([(seed, 0)])
    while q:
        node, hop = q.popleft()
        if hop >= 3:
            continue
        for nbr in adj[node]:
            if nbr not in want:
                want[nbr] = hop + 1
                q.append((nbr, hop + 1))
    assert got == want


def test_skyline_matches_bruteforce_on_random_points(spark):
    """The O(n log n) window-based skyline must equal the O(n²)
    dominance definition on random (price, size) data, including
    duplicate prices and duplicate points."""
    import random

    from pyspark.sql import functions as F

    from dbscan_spark.operators import relational

    rng = random.Random(7)
    rows = [
        (i, round(rng.uniform(1, 50), 2), rng.randint(1, 20))
        for i in range(300)
    ]
    # force collisions: duplicate some prices and full points
    rows += [(1000 + i, rows[i][1], rng.randint(1, 20)) for i in range(30)]
    rows += [(2000 + i, rows[i][1], rows[i][2]) for i in range(10)]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )

    import tempfile, os

    d = os.path.join(tempfile.mkdtemp(prefix="skyline_prop_"), "part.parquet")
    df.write.parquet(d)
    # point the operator at a scratch sf_dir holding only this table
    sf_dir = os.path.dirname(d)
    got = {
        r["p_partkey"]
        for r in relational.skyline_pareto_parts(spark, sf_dir).collect()
    }
    want = set()
    for k, p, s in rows:
        dominated = any(
            (q[1] <= p and q[2] >= s and (q[1] < p or q[2] > s))
            for q in rows
        )
        if not dominated:
            want.add(k)
    assert got == want


def test_compression_ratio_matches_direct_zlib(spark):
    """text_compression_ratio's per-doc ratios must equal direct zlib
    calls on the same text (level 6, floor-half-up at 1e-4), and bands
    must follow the rounded ratio."""
    import zlib

    from dbscan_spark.io import load_table
    from dbscan_spark.operators import text as t

    rows = {
        r["doc_id"]: (r["n_bytes"], r["compress_ratio"], r["quality_band"])
        for r in t.text_compression_ratio(spark, SF_TINY).collect()
    }
    src = load_table(spark, SF_TINY, "documents").select(
        "doc_id", "text"
    ).collect()
    assert len(rows) == len(src)
    for r in src:
        raw = r["text"].encode("utf-8")
        n = len(raw)
        c = len(zlib.compress(raw, 6))
        want = ((20000 * c + n) // (2 * n)) / 10000.0
        got_n, got_r, got_band = rows[r["doc_id"]]
        assert got_n == n
        assert got_r == want, r["doc_id"]
        expected_band = (
            "too_repetitive" if want < 0.25
            else "too_random" if want > 0.9 else "ok"
        )
        assert got_band == expected_band


def test_label_propagation_matches_python_replay(spark):
    """The full (round × node) LPA trajectory must match a driver-side
    pure-python synchronous replay on the same weighted graph — exact
    integer labels, no tolerance (same 5 rounds, same max-weight /
    min-label tie-break)."""
    from collections import defaultdict

    from dbscan_spark.operators import ml

    rows = ml.graph_label_propagation(spark, SF_TINY).collect()
    got = {(r["round"], r["s_suppkey"]): r["community"] for r in rows}
    assert got, "empty graph"
    from dbscan_spark.io import load_table

    l = load_table(spark, SF_TINY, "lineitem")
    so = l.select("l_orderkey", "l_suppkey").distinct().collect()
    by_order = defaultdict(set)
    for r in so:
        by_order[r["l_orderkey"]].add(r["l_suppkey"])
    w = defaultdict(int)
    for supps in by_order.values():
        ss = sorted(supps)
        if len(ss) > ml._MAX_SUPPLIERS_PER_ORDER:
            continue
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                w[(ss[i], ss[j])] += 1
                w[(ss[j], ss[i])] += 1
    neigh = defaultdict(dict)
    for (a, b), wt in w.items():
        neigh[b][a] = wt  # node b hears a's label with weight wt
    label = {n: n for n in neigh}
    want = {(0, n): lbl for n, lbl in label.items()}
    for rnd in range(1, 6):
        votes = {n: defaultdict(int) for n in neigh}
        for n, nbrs in neigh.items():
            for src, wt in nbrs.items():
                votes[n][label[src]] += wt
        label = {
            n: min(
                (lbl for lbl, c in v.items() if c == max(v.values()))
            )
            for n, v in votes.items()
        }
        want.update({(rnd, n): lbl for n, lbl in label.items()})
    assert got == want


def test_degenerate_rows_match_oracle_bpe_and_chunks(spark, tmp_path):
    """Regression for the round-8 sequence(a, b<a) class: Spark's
    sequence() yields a DESCENDING array when the stop is below the
    start, so single-char words / empty payloads silently emitted bogus
    pairs/chunks the DuckDB oracles (range(): empty) never count. The
    shipped corpora happen not to trigger it (counts stayed below the
    top-N cutoffs; no empty documents) — this crafted corpus does."""
    import duckdb
    import pandas as pd

    from dbscan_spark.operators import text as text_ops
    import __spark_entry__ as entry_mod
    from tests.test_oracle_parity import canonicalize

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a b c aa ab",      # single-char words dominate
                "",                      # empty payload
                "x",                     # 1-char payload, 1-char word
                "ab ab a b " + "z" * 600,  # multi-chunk + pairs
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [15, 0, 1, 610],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}'"
    )
    oracles = entry_mod.oracle_sql()
    for name, fn in (
        ("text_bpe_pair_merges", text_ops.text_bpe_pair_merges),
        ("multimodal_chunk_dedup", multimodal.multimodal_chunk_dedup),
    ):
        got = canonicalize(fn(spark, str(tmp_path)).toPandas())
        want = canonicalize(con.sql(oracles[name]).df())
        assert got == want, f"{name} diverges on degenerate rows"


def test_zero_norm_embeddings_match_oracle(spark, tmp_path):
    """Regression for the round-8 adversarial-fuzz finding: a zero-norm
    embedding made every cosine query throw DIVIDE_BY_ZERO under Spark's
    default ANSI mode while DuckDB yields NULL. Both engines now exclude
    zero-norm vectors from the similarity corpus; this crafted corpus
    (zero vector, exact-duplicate vector → cosine ties, 1e-30 vector →
    near-underflow norms) pins three cosine queries end-to-end."""
    import duckdb
    import numpy as np
    import pandas as pd

    import __spark_entry__ as entry_mod
    from tests.test_oracle_parity import canonicalize

    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(64).astype(np.float32) for _ in range(20)]
    vecs.append(np.zeros(64, dtype=np.float32))      # undefined direction
    vecs.append(vecs[0].copy())                       # exact dup: ties
    vecs.append(np.full(64, 1e-30, dtype=np.float32))  # tiny norm
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [list(v) for v in vecs],
            "label": np.arange(len(vecs)) % 3,
        }
    )
    emb["label"] = emb["label"].astype("int32")
    emb.to_parquet(tmp_path / "embeddings.parquet", index=False)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path / 'embeddings.parquet'}'"
    )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    for name in (
        "ann_topk_bruteforce",
        "similarity_range_search",
        "dedup_embedding_cosine",
    ):
        got = canonicalize(qs[name](spark, str(tmp_path)).toPandas())
        want = canonicalize(con.sql(oracles[name]).df())
        assert got == want, f"{name} diverges on zero-norm corpus"


def test_bpe_train_matches_pure_python_reference(spark, tmp_path):
    """text_bpe_train_merges vs an independent plain-Python BPE trainer
    (counts adjacent pairs WITH overlaps, merges leftmost
    non-overlapping — the canonical greedy rule) on a corpus with
    merge-order-sensitive words, overlap runs ('aaaa'), and ties."""
    import duckdb  # noqa: F401  (parity of the same corpus is covered in CI)
    import pandas as pd
    from collections import Counter

    from dbscan_spark.operators import text as text_ops

    texts = [
        "banana bandana cabana",
        "aaaa aaa banana",
        "low lower lowest low low",
        "new newer newest new",
        "a b c",  # 1-char words: no pairs
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    # independent reference
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                vocab[w] += 1
    state = {tuple(w): n for w, n in vocab.items()}
    expected = []
    for rnd in range(1, text_ops._BPE_ROUNDS + 1):
        counts: Counter = Counter()
        for syms, n in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rnd, l, r, n))
        new_state: dict = {}
        for syms, cnt in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + cnt
        state = new_state

    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_n"])
        for r in text_ops.text_bpe_train_merges(spark, str(tmp_path))
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected, f"\ngot:      {got}\nexpected: {expected}"

    # --- encoding against the same independent reference: apply the
    # learned merges greedily (leftmost, non-overlapping, in merge
    # order) to every word; 1-char words (outside the trained
    # vocabulary) encode as one symbol
    def enc_word(w):
        syms = list(w)
        for _, l, r, _n in expected:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want_rows = {}
    for doc_id, t in enumerate(texts):
        ws = t.split()
        want_rows[doc_id] = (
            len(ws),
            sum(len(w) for w in ws),
            sum(enc_word(w) for w in ws),
        )
    got_rows = {
        r["doc_id"]: (r["n_words"], r["n_char_tokens"], r["n_bpe_tokens"])
        for r in text_ops.text_bpe_encode(spark, str(tmp_path)).collect()
    }
    assert got_rows == want_rows, f"\ngot:  {got_rows}\nwant: {want_rows}"


def test_dup_spans_merge_intervals(spark, tmp_path):
    """text_dup_spans island logic on a hand-computable corpus: full-doc
    duplication (one island), two separated repeats (two islands), a
    clean doc (zeros), and the touch-merge rule — hits at pos 0 and 5
    with L=5 cover tokens 0-4 and 5-9, adjacent but non-overlapping, and
    must merge into ONE continuous covered span of 10."""
    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    texts = [
        "a b c d e f g h",                      # 0: dup of doc 1 — one island, full cover
        "a b c d e f g h",                      # 1
        "a b c d e x1 x2 x3 x4 x5 x6 a b c d e",  # 2: two separated islands
        "u1 u2 u3 u4 u5 u6 u7",                 # 3: unique — zeros
        "p q r s t v w x y z",                  # 4: hits at pos 0 and 5 → touch-merge
        "p q r s t",                            # 5: makes doc 4's pos-0 gram a dup
        "v w x y z",                            # 6: makes doc 4's pos-5 gram a dup
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["max_span_tokens"],
            r["dup_coverage"],
        )
        for r in text_ops.text_dup_spans(spark, str(tmp_path)).collect()
    }
    want = {
        0: (8, 1, 8, 1.0),
        1: (8, 1, 8, 1.0),
        2: (16, 2, 5, 0.625),
        3: (7, 0, 0, 0.0),
        4: (10, 1, 10, 1.0),   # merged [0,4]+[5,9] — NOT two spans of 5
        5: (5, 1, 5, 1.0),
        6: (5, 1, 5, 1.0),
    }
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_dup_span_removal_residuals(spark, tmp_path):
    """text_dup_span_removal on a crafted overlapping/touching-spans
    corpus: two ADJACENT shared runs inside one doc merge into a single
    island and their 14 tokens are removed exactly once; a fully
    duplicated doc pair rewrites to NULL; a clean doc keeps everything
    — each residual md5 pinned to the hand-computed kept stream."""
    import hashlib

    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    md = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    run_a = "aone atwo athree afour afive asix aseven"
    run_b = "bone btwo bthree bfour bfive bsix bseven"
    texts = [
        f"pre1 pre2 {run_a} {run_b} post1",     # 0: A[2,8] B[9,15] merge
        f"foo1 foo2 foo3 {run_a} bar9",          # 1: A only
        f"baz1 baz2 {run_b} qux7 qux8",          # 2: B only
        "d w1 w2 w3 w4 w5 w6 w7 w8 w9",          # 3: dup of 4 — all gone
        "d w1 w2 w3 w4 w5 w6 w7 w8 w9",          # 4
        "clean doc with nothing shared here",    # 5: untouched
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_kept_tokens"],
            r["n_removed_tokens"],
            r["residual_md5"],
        )
        for r in text_ops.text_dup_span_removal(
            spark, str(tmp_path)
        ).collect()
    }
    want = {
        0: (17, 3, 14, md("pre1 pre2 post1")),
        1: (11, 4, 7, md("foo1 foo2 foo3 bar9")),
        2: (11, 4, 7, md("baz1 baz2 qux7 qux8")),
        3: (10, 0, 10, None),
        4: (10, 0, 10, None),
        5: (6, 6, 0, md("clean doc with nothing shared here")),
    }
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_dup_spans_width_invariance(spark, tmp_path):
    """text_dup_spans_w50 is the same plan at the published width: a
    60-token doc duplicated verbatim is one full-cover island at BOTH
    widths, while a doc whose repeats are only 5 tokens long is
    invisible at width 50 (no 50-gram can repeat) but fully flagged at
    width 5 — the width must gate detection, not the island math."""
    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    long_doc = " ".join(f"t{i}" for i in range(60))
    short_rep = "a b c d e " + " ".join(f"u{i}" for i in range(50)) \
        + " a b c d e"
    texts = [long_doc, long_doc, short_rep]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    def run(fn):
        return {
            r["doc_id"]: (r["n_dup_spans"], r["max_span_tokens"])
            for r in fn(spark, str(tmp_path)).collect()
        }

    got_w50 = run(text_ops.text_dup_spans_w50)
    assert got_w50 == {0: (1, 60), 1: (1, 60), 2: (0, 0)}, got_w50
    got_w5 = run(text_ops.text_dup_spans)
    assert got_w5[2] == (2, 5), got_w5
    assert got_w5[0] == (1, 60) and got_w5[1] == (1, 60), got_w5


def test_dsir_separates_target_slice(spark, tmp_path):
    """dsir_importance_weights on a corpus with disjoint en/de bigram
    vocabularies: every en doc must score strictly above every non-en
    doc (its features are frequent in the target model and the model is
    fit ON the en slice), n_feats must equal n_tokens-1, and a 1-token
    doc must drop (no features)."""
    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    texts = [
        ("the cat sat on the mat", "en"),
        ("the dog sat on the rug", "en"),
        ("the cat ran to the dog", "en"),
        ("der hund lief zum haus", "de"),
        ("der gato sitzt auf dem", "de"),
        ("single", "de"),  # 1 token → no bigram features → dropped
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t for t, _ in texts],
            "lang": [lg for _, lg in texts],
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t, _ in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    rows = {
        r["doc_id"]: r
        for r in text_ops.dsir_importance_weights(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4}  # doc 5 dropped
    for doc_id, (t, _) in enumerate(texts[:5]):
        assert rows[doc_id]["n_feats"] == len(t.split()) - 1
    en_scores = [rows[i]["dsir_logratio"] for i in (0, 1, 2)]
    de_scores = [rows[i]["dsir_logratio"] for i in (3, 4)]
    assert min(en_scores) > max(de_scores), (en_scores, de_scores)


def test_quality_classifier_learns_target_direction(spark, tmp_path):
    """text_quality_classifier_* on a corpus with disjoint en/de
    bigram vocabularies: 5 GD rounds must push en-only feature
    weights POSITIVE and de-only weights NEGATIVE (gradient (p−y)·x
    with y = is-en), every en doc must score strictly above every
    non-en doc, a 1-token doc must drop, the bias row (bucket −1)
    must exist, every weight must sit on the 1e-4 grid (the
    replayability invariant), and the bucket terciles must ride the
    negated score (head = best)."""
    import pandas as pd

    from dbscan_spark.operators import text as text_ops

    texts = [
        ("the cat sat on the mat", "en"),
        ("the dog sat on the rug", "en"),
        ("the cat ran to the dog", "en"),
        ("der hund lief zum haus", "de"),
        ("der gato sitzt auf dem", "de"),
        ("single", "de"),  # 1 token → no bigram features → dropped
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t for t, _ in texts],
            "lang": [lg for _, lg in texts],
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t, _ in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    wrows = text_ops.text_quality_classifier_train(
        spark, str(tmp_path)
    ).collect()
    w = {r["bucket"]: r["w"] for r in wrows}
    assert -1 in w
    for v in w.values():
        assert v == round(v, 4), v  # 1e-4 grid
    # locate en-only vs de-only buckets via the operator's own hashing
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)

    def bigrams(t):
        toks = t.split()
        return [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]

    en_b = {bucket(g) for t, lg in texts if lg == "en" for g in bigrams(t)}
    de_b = {bucket(g) for t, lg in texts if lg == "de" for g in bigrams(t)}
    only_en, only_de = en_b - de_b, de_b - en_b
    assert only_en and only_de, "fixture bigram buckets collided"
    assert all(w[b] > 0 for b in only_en), [w[b] for b in only_en]
    assert all(w[b] < 0 for b in only_de), [w[b] for b in only_de]

    rows = {
        r["doc_id"]: r
        for r in text_ops.text_quality_classifier_scores(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4}  # doc 5 dropped
    for doc_id, (t, lg) in enumerate(texts[:5]):
        assert rows[doc_id]["n_feats"] == len(t.split()) - 1
        assert rows[doc_id]["is_target"] == (lg == "en")
    en_s = [rows[i]["score"] for i in (0, 1, 2)]
    de_s = [rows[i]["score"] for i in (3, 4)]
    assert min(en_s) > max(de_s), (en_s, de_s)

    buck = {
        r["doc_id"]: r
        for r in text_ops.corpus_quality_classifier_buckets(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(buck) == {0, 1, 2, 3, 4}
    for d, r in buck.items():
        assert r["nll"] == -rows[d]["score"], d


def test_ccnet_pipeline_composes_its_stages(spark):
    """corpus_ccnet_pipeline: the verdict vector must equal its three
    stage queries run standalone (pred_lang from text_language_id,
    nll + ppl_bucket from corpus_ccnet_buckets_kn5, cls_score from
    text_quality_classifier_scores), the keep booleans must follow
    their definitions (cls_keep = score strictly above the trained
    prior sigmoid(bias); NULL cls_score → false), and the fixture
    must exercise both keep outcomes."""
    import math

    from dbscan_spark.operators import text as text_ops

    rows = {
        r["doc_id"]: r
        for r in text_ops.corpus_ccnet_pipeline(spark, SF_TINY).collect()
    }
    lid = {
        r["doc_id"]: r["pred_lang"]
        for r in text_ops.text_language_id(spark, SF_TINY).collect()
    }
    buck = {
        r["doc_id"]: r
        for r in text_ops.corpus_ccnet_buckets_kn5(
            spark, SF_TINY
        ).collect()
    }
    cls = {
        r["doc_id"]: r["score"]
        for r in text_ops.text_quality_classifier_scores(
            spark, SF_TINY
        ).collect()
    }
    bias = {
        r["bucket"]: r["w"]
        for r in text_ops.text_quality_classifier_train(
            spark, SF_TINY
        ).collect()
    }[-1]
    p0 = math.floor(
        (1.0 / (1.0 + math.exp(-bias))) * 10000 + 0.5
    ) / 10000
    assert set(rows) == set(buck)  # spine = every LM-scored doc
    for d, r in rows.items():
        assert r["pred_lang"] == lid[d]
        assert r["nll"] == buck[d]["nll"]
        assert r["ppl_bucket"] == buck[d]["bucket"]
        assert r["cls_score"] == cls.get(d)
        assert r["lid_keep"] == (r["pred_lang"] != "und")
        want_cls = cls.get(d) is not None and cls[d] > p0
        assert r["cls_keep"] == want_cls
        assert r["keep"] == (
            r["lid_keep"] and r["ppl_bucket"] != "tail" and want_cls
        )
    outcomes = {r["keep"] for r in rows.values()}
    assert outcomes == {True, False}, outcomes


def test_lang_temperature_matches_numpy(spark):
    """corpus_lang_temperature vs an independent numpy computation of
    q_l = p_l^alpha / sum p_l^alpha from the operator's own per-lang
    token counts; plus the recipe's defining property — flattening:
    the head language's share shrinks, tail languages' shares grow."""
    import numpy as np

    from dbscan_spark.operators import text as text_ops

    rows = text_ops.corpus_lang_temperature(spark, SF_SMALL).collect()
    m = np.array([r["n_tokens"] for r in rows], dtype=float)
    p = m / m.sum()
    q = p ** text_ops._MIX_ALPHA / (p ** text_ops._MIX_ALPHA).sum()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    for r, pi, qi in zip(rows, p, q):
        assert abs(r["token_share"] - pi) < 5e-4, (r, pi)
        assert abs(r["temp_share"] - qi) < 5e-4, (r, qi)
        if pi == p.max():
            assert qi < pi  # head shrinks
        if pi == p.min():
            assert qi > pi  # tail grows


def test_ccnet_buckets_skewed_language_exact_and_plan(spark, tmp_path):
    """VERDICT r9 #4 pin: corpus_ccnet_buckets on a 95%-one-language
    corpus (the CommonCrawl dominant-language shape) with MASS TIES at
    the rounded-score boundary — exact DuckDB ntile replay must match,
    and the plan must contain no ntile window (the old per-language
    full sort; the CDF-cutoff form buckets by broadcast compare and
    windows only the boundary tie-groups)."""
    import duckdb
    import pandas as pd

    from dbscan_spark.operators.text import corpus_ccnet_buckets

    # 95% "en" / 4% "de" / one NULL-lang stratum; word pools sized so
    # many docs share identical unigram NLL (rounded) — tie groups
    # straddle both ntile cuts
    rows = []
    for i in range(300):
        if i < 285:
            lang = "en"
            text = ["alpha beta", "alpha gamma", "beta gamma"][i % 3]
        elif i < 297:
            lang = "de"
            text = ["der die", "der das"][i % 2]
        else:
            lang = None
            text = "nix nada none"
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": lang,
                "source": "s",
                "n_chars": len(text),
            }
        )
    pd.DataFrame(rows).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    got = (
        corpus_ccnet_buckets(spark, str(tmp_path))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"FROM '{tmp_path}/documents.parquet'"
    )
    import __spark_entry__ as e

    want = (
        con.sql(e.oracle_sql()["corpus_ccnet_buckets"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 300
    assert list(got["bucket"]) == list(want["bucket"])
    assert [round(x, 4) for x in got["nll"]] == [
        round(x, 4) for x in want["nll"]
    ]
    # every stratum (incl. NULL lang) cut into thirds of the right sizes
    for lang, grp in want.groupby("lang", dropna=False):
        sizes = grp["bucket"].value_counts()
        assert max(sizes) - min(sizes) <= 1
    # plan shape: no ntile window anywhere (the skew-killer)
    plan = corpus_ccnet_buckets(spark, str(tmp_path))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ntile" not in plan.lower()


def test_paragraph_dedup_ccnet_semantics(spark, tmp_path):
    """corpus_paragraph_dedup concrete semantics on a hand-built corpus:
    global first occurrence (min (doc_id, pos)) keeps, later docs drop
    the shared boilerplate, within-doc repeats drop, normalization
    collapses case/punct variants, empty paragraphs never count, and
    the residual hash is the md5 of kept normalized paragraphs in
    original order."""
    import hashlib as _h

    import pandas as pd

    from dbscan_spark.operators.dedup import corpus_paragraph_dedup

    docs = [
        (0, "Header!\nbody zero\nFooter."),
        (1, "header\nbody one\nfooter"),        # both ends dup of doc 0
        (2, "body two\nbody two\nBODY TWO!!"),   # within-doc repeats
        (3, "\n\n!!!\n"),                        # all-empty paragraphs
        (4, "body zero"),                        # dup of doc 0's middle
    ]
    pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r
        for r in corpus_paragraph_dedup(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: _h.md5(s.encode()).hexdigest()  # noqa: E731
    assert (got[0]["n_paragraphs"], got[0]["n_kept"], got[0]["n_dropped"]) == (3, 3, 0)
    assert got[0]["residual_hash"] == md5("header\nbody zero\nfooter")
    assert (got[1]["n_paragraphs"], got[1]["n_kept"]) == (3, 1)
    assert got[1]["residual_hash"] == md5("body one")
    assert (got[2]["n_paragraphs"], got[2]["n_kept"]) == (3, 1)
    assert got[2]["residual_hash"] == md5("body two")
    assert (got[3]["n_paragraphs"], got[3]["n_kept"]) == (0, 0)
    assert got[3]["residual_hash"] is None
    assert (got[4]["n_kept"], got[4]["n_dropped"]) == (0, 1)
    assert got[4]["residual_hash"] is None


def test_gopher_rules_each_rule_fires(spark, tmp_path):
    """corpus_gopher_rules: each Table A1 rule flips on a purpose-built
    doc while the others hold, and a well-formed doc passes all seven."""
    import pandas as pd

    from dbscan_spark.operators.text import corpus_gopher_rules

    good = ("the quick brown fox and the lazy dog be running to "
            "the old mill of the valley that have seen many summers "
            "with friends ") * 3  # ~90 words, stopword-rich, clean
    docs = [
        (0, good),
        (1, "short text with the and of"),             # < 50 words
        (2, " ".join(["a"] * 60) + " the of"),          # mean len < 3
        (3, good + " " + "#" * 40),                     # symbol ratio
        (4, "\n".join("- bullet line the of" for _ in range(10))),
        (5, "\n".join("line the of trailing..." for _ in range(10))),
        (6, " ".join(["123"] * 60) + " the of"),        # low alpha
        (7, " ".join(["word"] * 60)),                   # no stopwords
        (8, ""),                                         # degenerate
        # trimmed-line semantics (ADVICE r10): indented bullets and
        # trailing-space ellipses count toward the line fractions
        (9, "\n".join("  - indented bullet the of" for _ in range(10))),
        (10, "\n".join("line the of trailing...  " for _ in range(10))),
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_gopher_rules(spark, str(tmp_path)).collect()
    }
    assert got[0]["keep"] is True
    assert got[1]["r_word_count"] is False and got[1]["r_stopwords"]
    assert got[2]["r_mean_word_len"] is False
    assert got[3]["r_symbol_ratio"] is False and got[3]["r_word_count"]
    assert got[4]["r_bullet_lines"] is False
    assert got[5]["r_ellipsis_lines"] is False
    assert got[6]["r_alpha_words"] is False
    assert got[7]["r_stopwords"] is False
    assert got[8]["n_words"] == 0 and got[8]["keep"] is False
    # vacuous line rules pass on the no-lines doc; word rules fail hard
    assert got[8]["r_bullet_lines"] is True
    assert got[8]["r_mean_word_len"] is False
    # trimmed-line semantics: leading spaces / trailing spaces don't
    # hide a bullet-initial or ellipsis-final line (ADVICE r10)
    assert got[9]["r_bullet_lines"] is False
    assert got[10]["r_ellipsis_lines"] is False


def test_ann_pq_deep_scales_depth_and_recall(spark):
    """ann_topk_pq_deep (VERDICT r9 #8): the production scaled-re-rank
    configuration must (a) never recall WORSE than the fixed-depth
    stack, (b) emit exactly 5 rows per query, and (c) actually scale
    its depth with the corpus (N/10 > 32 at the grading SF, so the
    candidate cutoff genuinely differs from ann_topk_pq's)."""
    import math
    from collections import Counter

    from dbscan_spark.operators.similarity import (
        _PQ_DEEP_DIV,
        _PQ_RERANK,
        _embeddings_with_norms,
    )

    n = _embeddings_with_norms(spark, SF_SMALL).count()
    assert math.ceil(n / _PQ_DEEP_DIV) > _PQ_RERANK

    bf = similarity.ann_topk_bruteforce(spark, SF_SMALL)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    fixed = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_pq(spark, SF_SMALL).collect()
    }
    rows = similarity.ann_topk_pq_deep(spark, SF_SMALL).collect()
    deep = {(r["query_id"], r["neighbor_id"]) for r in rows}
    per_q = Counter(r["query_id"] for r in rows)
    assert all(v == 5 for v in per_q.values()), per_q
    r_fixed = len(fixed & truth) / len(truth)
    r_deep = len(deep & truth) / len(truth)
    assert r_deep >= r_fixed, (r_deep, r_fixed)
    # floor against regressions (measured 0.78 at N=500/depth=50; the
    # sf1.0 production-depth number, 0.90, is recorded in BASELINE §5i)
    assert r_deep >= 0.7, f"deep recall too low at the grading SF: {r_deep}"


def test_gopher_repetition_rules(spark, tmp_path):
    """corpus_gopher_repetition: hand-checked fractions on purpose-built
    docs — dup lines (all members count), top-gram char mass (tie to
    lexicographically smallest), dup-5-gram mass (every occurrence of
    every >=2x gram), and vacuous passes on degenerate docs."""
    import pandas as pd

    from dbscan_spark.operators.text import corpus_gopher_repetition

    docs = [
        # 4 lines, "dup line" x2 -> dup_line_frac = 0.5; chars: dup
        # lines 2*8=16 of 8+8+6+5=27
        (0, "dup line\ndup line\nline a\nother"),
        # tokens: b a b a c -> top 2-grams: 'b a' x2, 'a b' x1, 'a c'
        # x1 -> top mass 2*3=6, tc = 9 ("b a b a c")
        (1, "b a b a c"),
        # looping 5-gram text: 'x y z w v' * 3 -> every 5-gram repeats
        (2, "x y z w v " * 3),
        (3, ""),  # degenerate: no tokens, no lines -> all vacuous
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_gopher_repetition(spark, str(tmp_path)).collect()
    }
    assert got[0]["dup_line_frac"] == 0.5
    assert got[0]["dup_line_char_frac"] == round(16 / 27, 4)
    assert got[0]["keep"] is False  # 0.5 > 0.30
    assert got[1]["top_2gram_char_frac"] == round(6 / 9, 4)
    assert got[1]["keep"] is False
    # doc 2: 15 tokens -> 11 5-grams, all "x y z w v"-rotations; every
    # gram occurs >= 2x except none — check all 11 occur in dup mass:
    # rotations each appear 2-3x, so dup mass = sum over all 11
    # occurrences * 9 chars = 99; tc = len("x y z w v "*3 normalized)
    assert got[2]["dup_5gram_char_frac"] > 0.5
    assert got[2]["keep"] is False
    assert got[3]["keep"] is True  # all vacuous
    assert got[3]["dup_line_frac"] is None


def test_c4_filters_line_and_page_rules(spark, tmp_path):
    """corpus_c4_filters: each published rule checked by hand — line
    keep requires terminal punctuation + >=3 words + no 'javascript';
    page keep requires >=5 sentence marks, no lorem ipsum, no brace;
    cleaned_md5 hashes exactly the kept trimmed lines."""
    import hashlib as _h

    import pandas as pd

    from dbscan_spark.operators.text import corpus_c4_filters

    docs = [
        (0, "Keep this line here.\nno punct line\nok.\n"
            "uses javascript sadly.\nAnother good line stays! "
            "Ok? Sure. Fine."),
        (1, "Lorem ipsum dolor sit. More words here. And more. "
            "Even more. Fifth sentence here."),
        (2, "Brace page { code }. One two three. Four five six. "
            "Seven eight nine. Ten eleven twelve."),
        (3, "Too few sentences but clean lines stay fine."),
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_c4_filters(spark, str(tmp_path)).collect()
    }
    # doc 0: lines -> keep: "Keep this line here." and the 4-sentence
    # last line; dropped: no-punct, 2-word "ok.", javascript line
    assert got[0]["n_lines"] == 5
    assert got[0]["n_lines_kept"] == 2
    md5 = lambda s: _h.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[0]["cleaned_md5"] == md5(
        "Keep this line here.\nAnother good line stays! Ok? Sure. Fine."
    )
    assert got[0]["n_sentences"] == 5 and got[0]["keep"] is True
    assert got[1]["has_lorem_ipsum"] is True and got[1]["keep"] is False
    assert got[2]["has_brace"] is True and got[2]["keep"] is False
    assert got[3]["n_sentences"] == 1 and got[3]["keep"] is False


def test_dedup_incremental_every_verdict(spark, tmp_path):
    """dedup_incremental: every verdict branch forced on hand-built
    docs whose md5(doc_id) split side is precomputed — incoming ids
    {3, 5, 34, 44, 49}, existing ids {0, 1, 2, 4, ...}."""
    import pandas as pd

    from dbscan_spark.operators.dedup import dedup_incremental

    docs = [
        (0, "corpus doc one stays"),             # existing
        (1, "Corpus DOC one!! stays"),           # existing fp-twin of 0
        (2, "another corpus doc"),               # existing
        (3, "corpus doc one stays"),             # incoming: exact dup of 0
        (5, "Corpus doc ONE stays?"),            # incoming: fp dup of 0
        (34, "fresh incoming text a"),           # incoming: ingest
        (44, "batch twin text"),                 # incoming: batch first
        (49, "batch twin text"),                 # incoming: batch dup of 44
    ]
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert set(got) == {3, 5, 34, 44, 49}  # only the incoming slice
    assert got[3]["action"] == "drop_exact"
    assert got[3]["first_seen_exact"] == 0
    assert got[5]["action"] == "drop_near"
    assert got[5]["first_seen_fp"] == 0  # fp index keeps the EARLIEST
    assert got[34]["action"] == "ingest"
    assert got[44]["action"] == "ingest"  # batch-first occurrence keeps
    assert got[49]["action"] == "drop_batch_dup"


def test_rewarm_pair_cache_restores_evicted_memo(spark):
    """VERDICT r9 #3 regression pin: after a blanket clearCache()
    sweep, the shared MinHash pair-graph memo must be re-persistable
    via dedup.rewarm_pair_cache so a downstream consumer (bench's
    dedup_cluster_cc) reads cached blocks instead of silently
    recomputing the LSH pipeline inside its own timing."""
    from pyspark import StorageLevel

    from dbscan_spark.operators.dedup import (
        _minhash_lsh_pairs_cached,
        rewarm_pair_cache,
    )

    df = _minhash_lsh_pairs_cached(spark, SF_TINY)
    df.count()
    assert df.storageLevel != StorageLevel.NONE
    spark.catalog.clearCache()
    assert df.storageLevel == StorageLevel.NONE  # the r9 bench regime
    rewarm_pair_cache(spark, SF_TINY)
    assert df.storageLevel != StorageLevel.NONE  # marked AND materialized
