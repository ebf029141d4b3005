#!/usr/bin/env python3
"""Build an ADVERSARIAL scale-factor dir for cross-engine fuzzing.

`tools/scale_up.py` fuzzes SCALE (replicated rows, tie-heavy groups) but
structurally cannot produce new degenerate row SHAPES — it replicates
existing text and vectors. This tool fuzzes SHAPE: it copies the sf0.001
tables verbatim and appends the degenerate rows a real 100 TB corpus
contains but the shipped synthetic corpora never do:

documents — empty text, whitespace/punctuation-only text (normalizes to
  empty), single-char words, a 5000-char single word, an exact duplicate
  of an existing document, NULL lang/source;
embeddings — an all-zero vector (norm 0: cosine undefined — Spark ANSI
  division THROWS where DuckDB yields NULL), a 2x-scaled copy of an
  existing vector (bit-identical cosine to its original — powers of two
  scale every fp dot/norm term exactly — so cosine TIES are fuzzed
  without duplicating any coordinate tuple), a tiny-magnitude vector
  (1e-30 — norm underflow), a coordinate-axis vector;

DBSCAN-oracle validity precondition (BASELINE §5d P5, VERDICT r8): the
dbscan_flags / dbscan_core_components / dbscan_predict_canonical SQL
oracles count ids, while the engine reproduces the reference's
VALUE-keyed margin dedup — two ids at identical coordinates inside an
ε-margin collapse to one engine row but two oracle rows. The oracles
are therefore only valid on corpora whose coordinate tuples are
distinct; main() asserts that for both the 2-D (embedding[0],
embedding[1]) projection and the full vector before this corpus is
handed to the grader, so a future corpus edit cannot silently grade
DBSCAN against an invalid oracle.
relational tables (round-8 second extension) — the dirty-warehouse
  shapes: NULL and dangling join keys (orphan orders, customers with no
  nation), NULL GROUP BY / pivot keys, NULL window ORDER keys (the
  NULLS FIRST-vs-LAST engine default divergence class), NULL event
  time, NaN/±Infinity measures (upstream sensor garbage), zero and
  negative money (refunds/credits), duplicate primary keys, exact
  same-user same-timestamp bursts (sessionization ties), and NULL /
  empty / malformed JSON props.

Deliberately NOT included: a far-future or epoch `ts` outlier in
events. The gap-fill family materializes an hourly `sequence(min(ts),
max(ts))` grid, so ONE bogus 2099 row inflates the grid by ~1e6 slots
per series — a genuine 100 TB operational hazard, but it turns the
fuzz run into a grid-materialization benchmark. The hazard and the
mitigation (bound the grid to a sane retention window before
sequencing) are documented in BASELINE.md §5d instead.

Usage: python tools/make_adversarial_sf.py  →  /root/repo/.scale/adversarial
Then:  python tools/driver_sim.py --sf /root/repo/.scale/adversarial --first 250

Round-8 findings from this corpus are recorded in BASELINE.md §5d.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("ADV_SRC", "/root/testdata/sf0.001")
OUT = os.environ.get("ADV_OUT", "/root/repo/.scale/adversarial")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    base = max(r["doc_id"] for r in rows) + 1
    dup_of = rows[0]
    extra_texts = [
        ("", "en", "adv"),                       # empty payload
        ("   ", "en", "adv"),                    # whitespace-only
        ("!!! ??? ...", "en", "adv"),            # normalizes to empty
        ("a", "en", "adv"),                      # 1-char doc, 1-char word
        ("a a a a a b c a a", "en", "adv"),      # single-char word spam
        ("z" * 5000, "en", "adv"),               # one giant word, multi-chunk
        (dup_of["text"], dup_of["lang"], "adv"),  # exact cross-source dup
        ("null lang row words here", None, "adv"),
        ("null source row words here", "en", None),
        # round-9 unicode wave: multibyte text diverges engines wherever
        # "character" and "byte" are conflated (found: the multimodal
        # oracles walked codepoints while Spark walked UTF-8 bytes, and
        # a codepoint beyond the BMP overflowed INT32 squaring)
        ("héllo wörld café naïve résumé", "en", "adv"),
        ("日本語 のテキスト 処理 テスト 漢字", "ja", "adv"),
        ("🎉 emoji 🚀 text 🤖 stream 🎯 here", "en", "adv"),
        ("e\u0301tude re\u0301sume\u0301 franc\u0327ais", "fr", "adv"),
        ("مرحبا بالعالم هذا نص عربي", "ar", "adv"),
        ("ΑΒΓΔ αβγδ ΕΛΛΗΝΙΚΑ ελληνικα", "el", "adv"),
        ("ß groß STRASSE straße", "de", "adv"),
        ("a\u00a0b\u2009c\u3000d", "en", "adv"),
        ("𝕞𝕒𝕥𝕙 𝔣𝔯𝔞𝔨𝔱𝔲𝔯 𝗌𝖺𝗇𝗌 text", "en", "adv"),
        # round-10 paragraph wave (corpus_paragraph_dedup): the base
        # corpus has no newlines, so multi-paragraph docs — shared
        # boilerplate across docs, within-doc repeats, empty/
        # punctuation-only segments, trailing newline — live here
        ("shared cookie banner\nunique body one\nshared footer",
         "en", "adv"),
        ("shared cookie banner\nunique body two\nshared footer",
         "en", "adv"),
        ("repeat me\nrepeat me\nREPEAT ME!\nmiddle text\n",
         "en", "adv"),
        ("\n\n!!!\n   \nonly real paragraph here\n\n", "en", "adv"),
        ("\n\n\n", "en", "adv"),  # every paragraph normalizes empty
        # round-10 C4 wave (corpus_c4_filters): the base corpus has no
        # sentence punctuation, so the keep path lives here — terminal
        # punctuation, short lines, javascript lines, lorem ipsum,
        # code braces
        ("This page has real sentences. It keeps five of them! "
         "Does it pass? Yes it does. Five marks total.",
         "en", "adv"),
        ("Good line stays here.\nshort one.\nNo terminal punct line\n"
         "this javascript line is dropped.\nAnother keeper line stays.",
         "en", "adv"),
        ("Lorem ipsum dolor sit amet. Plus other sentences. More here. "
         "And more. And a fifth.", "en", "adv"),
        ("A code page { return 0; } with sentences. One. Two. Three. "
         "Four sentences more.", "en", "adv"),
    ]
    # round-14 constant-image wave (VERDICT r13 #4): a block of
    # byte-identical documents → byte-identical PPM rasters → ONE
    # shared 36-bit phash → every 12-bit band bucket degenerate-hot.
    # Exercises the distinct-hash collapse in multimodal_phash_neardup
    # (banded join work must stay O(distinct hashes), the C(12,2)=66
    # hamming-0 pairs come from the equality expansion) and, as a side
    # effect, deepens every text-dedup group shape (exact/minhash/
    # simhash all see a 12-deep duplicate class).
    extra_texts.extend(
        [("constant thumbnail block image bytes", "en", "adv")] * 12
    )
    for i, (text, lang, source) in enumerate(extra_texts):
        rows.append(
            {
                "doc_id": base + i,
                "text": text,
                "lang": lang,
                "source": source,
                "n_chars": len(text),
            }
        )
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                   f"{OUT}/documents.parquet")


def embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    rows = t.to_pylist()
    base = max(r["vec_id"] for r in rows) + 1
    dim = len(rows[0]["embedding"])
    axis = [0.0] * dim
    axis[0] = 1.0
    extras = [
        ([0.0] * dim, 0),                    # zero vector: cosine undefined
        # 2x-scaled copy: cosine ties bit-exactly with its original
        # (powers of two scale fp dot/norm terms exactly) while keeping
        # every coordinate tuple distinct — the DBSCAN oracles' validity
        # precondition (see module docstring)
        ([2.0 * x for x in rows[0]["embedding"]], rows[0]["label"]),
        ([1e-30] * dim, 1),                  # norm underflow
        (axis, 2),                           # coordinate axis
        # round-9 ragged wave: ONE truncated vector (half the corpus
        # dimension) crashed every np.stack path, threw ANSI
        # INVALID_ARRAY_INDEX on v[dim-1] projections, and silently
        # NULL-diverged zip_with folds — excluded at ingestion by the
        # audited modal-dimension rule (io.load_embeddings)
        ([0.1] * (dim // 2), 1),
    ]
    for i, (v, label) in enumerate(extras):
        rows.append(
            {
                "vec_id": base + i,
                "embedding": [np.float32(x) for x in v],
                "label": label,
            }
        )
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                   f"{OUT}/embeddings.parquet")


def _append(name: str, extras: list[dict]) -> None:
    """Copy a source table verbatim and append degenerate rows, keeping
    the source schema (all columns are nullable in the shipped files)."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    rows = t.to_pylist() + extras
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                   f"{OUT}/{name}.parquet")


def _dt(*a):
    import datetime

    return datetime.datetime(*a)


def relational() -> None:
    # orders: orphan/dangling custkeys, NULL group & window-order keys,
    # zero/negative/huge money (refund + cents-sum headroom probe).
    o = lambda k, **kw: {  # noqa: E731 — row template
        "o_orderkey": 90000 + k, "o_custkey": 7,
        "o_orderstatus": "F", "o_totalprice": 1000.0,
        "o_orderdate": _dt(1998, 6, 15), "o_orderpriority": "5-LOW", **kw,
    }
    _append("orders", [
        o(0, o_custkey=None),                       # orphan order
        o(1, o_custkey=999_999_999),                # dangling FK
        o(2, o_totalprice=0.0),
        o(3, o_totalprice=-500.25),                 # refund
        o(4, o_totalprice=9e12),                    # cents-sum headroom
        o(5, o_orderdate=None),                     # NULL window ORDER key
        o(6, o_orderdate=_dt(1970, 1, 1)),          # epoch boundary
        o(7, o_orderstatus=None, o_orderpriority=None),  # NULL group keys
    ])

    # lineitem: NULL join key, zero/negative measures, full discount,
    # NULL dates/flags, and an exact duplicate of an existing line
    # (duplicate PK — the retry-ingest shape).
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pylist()
    dup = dict(li[0])
    l = lambda n, **kw: {  # noqa: E731
        "l_orderkey": 201, "l_partkey": 101, "l_suppkey": 9,
        "l_linenumber": 90 + n, "l_quantity": 5.0,
        "l_extendedprice": 1000.0, "l_discount": 0.05, "l_tax": 0.02,
        "l_returnflag": "N", "l_linestatus": "O",
        "l_shipdate": _dt(1998, 3, 1), **kw,
    }
    _append("lineitem", [
        l(0, l_orderkey=None),                      # orphan line
        l(1, l_quantity=0.0, l_extendedprice=0.0),  # zero measures
        l(2, l_discount=1.0),                       # revenue → exactly 0
        l(3, l_extendedprice=-250.75),              # credit line
        l(4, l_shipdate=None),                      # NULL filter/order key
        l(5, l_returnflag=None, l_linestatus=None),  # NULL group keys
        dup,                                        # duplicate PK
    ])

    # events: NULL event-time/user/type, NaN & ±Infinity measures,
    # duplicate event_id, an exact same-user same-ts burst
    # (sessionization / window tie), NULL-empty-malformed JSON props.
    tie = _dt(2024, 1, 15, 12, 0, 0)
    e = lambda k, **kw: {  # noqa: E731
        "event_id": 90000 + k, "ts": _dt(2024, 1, 20, 8, 30, k),
        "user_id": 13, "event_type": "click", "value": 10.0,
        "props": '{"k": 1}', **kw,
    }
    _append("events", [
        e(0, ts=None),                              # NULL event time
        e(1, user_id=None),                         # NULL session key
        e(2, value=None),
        e(3, value=float("nan")),                   # sensor garbage
        e(4, value=float("inf")),
        e(5, value=float("-inf")),
        e(6, event_id=0),                           # duplicate PK
        e(7, ts=tie), e(8, ts=tie), e(9, ts=tie),   # exact-tie burst
        e(10, event_type=None),                     # NULL group key
        e(11, props=None), e(12, props=""), e(13, props="not json{"),
        e(14, props="{}"),
    ])

    # customer / supplier / part / nation: NULL & dangling dimension
    # keys, NULL pivot segments, negative balances, zero sizes.
    _append("customer", [
        {"c_custkey": 9000, "c_name": "Customer#ADV0", "c_nationkey": None,
         "c_acctbal": 100.0, "c_mktsegment": "FURNITURE"},
        {"c_custkey": 9001, "c_name": "Customer#ADV1", "c_nationkey": 99,
         "c_acctbal": -1e9, "c_mktsegment": None},
        {"c_custkey": 9002, "c_name": None, "c_nationkey": 2,
         "c_acctbal": 0.0, "c_mktsegment": "AUTOMOBILE"},
    ])
    _append("supplier", [
        {"s_suppkey": 9000, "s_name": "Supplier#ADV0",
         "s_nationkey": None, "s_acctbal": -42.5},
        {"s_suppkey": 9001, "s_name": None, "s_nationkey": 0,
         "s_acctbal": 0.0},
    ])
    _append("part", [
        {"p_partkey": 9000, "p_name": "adv null type", "p_brand": "Brand#9",
         "p_type": None, "p_size": 0, "p_retailprice": 100.0},
        {"p_partkey": 9001, "p_name": "", "p_brand": None,
         "p_type": "ECONOMY ANODIZED STEEL", "p_size": -1,
         "p_retailprice": -10.0},
    ])
    _append("nation", [
        {"n_nationkey": 90, "n_name": "ADVERSARIA", "n_regionkey": None},
    ])
    _append("region", [
        {"r_regionkey": 90, "r_name": None},
    ])


def _assert_dbscan_oracle_precondition() -> None:
    """Fail loudly if the written corpus violates the DBSCAN oracles'
    validity precondition (distinct coordinate tuples — see module
    docstring); a violating corpus must not reach the grader."""
    rows = pq.read_table(f"{OUT}/embeddings.parquet").to_pylist()
    # the oracles read through the modal-dimension ingestion rule
    # (io.EMB_CLEAN_SQL), so the precondition applies to that subset
    from collections import Counter

    sizes = Counter(len(r["embedding"]) for r in rows)
    modal = max(sizes, key=lambda d: (sizes[d], d))
    rows = [r for r in rows if len(r["embedding"]) == modal]
    xy = [(r["embedding"][0], r["embedding"][1]) for r in rows]
    full = [tuple(r["embedding"]) for r in rows]
    assert len(set(xy)) == len(xy), (
        "duplicate (embedding[0], embedding[1]) tuples — the 2-D DBSCAN "
        "oracles (dbscan_flags/dbscan_core_components/"
        "dbscan_predict_canonical) are id-keyed and INVALID on this "
        "corpus; de-duplicate the coordinates (e.g. scale a copy by a "
        "power of two for cosine ties) or grade DBSCAN rows-only"
    )
    assert len(set(full)) == len(full), (
        "duplicate full embedding vectors — the 64-d DBSCAN oracle "
        "precondition is violated (see 2-D message above)"
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        shutil.copy(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
    documents()
    embeddings()
    relational()
    _assert_dbscan_oracle_precondition()
    # a process that already measured OUT's modal embedding dimension
    # (in-process regeneration) must not keep filtering with the stale
    # value — the cache is deliberately not mtime-keyed (io.py, ADVICE r9)
    import importlib.util

    if importlib.util.find_spec("dbscan_spark") is not None:
        from dbscan_spark.io import clear_modal_dim_cache

        clear_modal_dim_cache(OUT)
    # derived on-disk mirrors (JSON/CSV events, binary blob landing
    # zone) are keyed by this corpus' basename and memoized by a
    # _SUCCESS marker — purge them so regeneration can't leave a
    # stale mirror silently certified against the new parquet
    _purge_mirrors(OUT)
    print(f"adversarial SF written to {OUT}")


def _purge_mirrors(sf_dir: str) -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = os.path.basename(os.path.normpath(sf_dir))
    for root in (".json_mirror", ".blob_mirror"):
        p = os.path.join(repo_root, root, key)
        if os.path.isdir(p):
            shutil.rmtree(p)


if __name__ == "__main__":
    main()
