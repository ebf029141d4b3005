"""Shared column expressions (all JVM-side pyspark.sql.functions — no UDFs).

These are the building blocks the dedup / similarity / text operators share.
Each has an exact DuckDB-SQL counterpart documented inline so the operator
modules can keep their oracle strings in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: normalization regexes — identical syntax/semantics in Spark (Java regex)
#: and DuckDB (RE2): strip non-alphanumerics, collapse runs of spaces.
_NON_ALNUM = "[^a-z0-9 ]"
_MULTISPACE = " +"


def norm_text(col: Column) -> Column:
    """Lowercase, strip punctuation, collapse whitespace.

    DuckDB: ``trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9 ]',' ','g'),' +',' ','g'))``
    """
    cleaned = F.regexp_replace(F.lower(col), _NON_ALNUM, " ")
    return F.trim(F.regexp_replace(cleaned, _MULTISPACE, " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text.

    DuckDB: ``string_split(<norm_text>, ' ')``
    """
    return F.split(norm_text(col), " ")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles; empty array when fewer than n tokens.

    DuckDB: ``list_transform(range(1, greatest(len(t)-{n-1},0)+1),
    i -> t[i] || ' ' || ... || t[i+{n-1}])``
    """
    # Build with row-level slice + zip_with, NOT element_at inside a
    # transform lambda: Catalyst inlines the tokenization expression into
    # every lambda reference, so an element_at(tok, i+k) formulation
    # re-tokenizes the document per shingle position — O(tokens²) per row
    # (measured 38 s for 5k docs). Slices evaluate the token array a
    # constant number of times per row.
    size = F.size(tok)
    cnt = size - (n - 1)
    parts = [F.slice(tok, k + 1, cnt) for k in range(n)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(size >= n, sh).otherwise(F.array().cast("array<string>"))


def as_double_array(col: Column) -> Column:
    """Cast array<float> to array<double> so dot products accumulate in
    float64 on both engines. DuckDB: ``x::DOUBLE[]``."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays.

    DuckDB: ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def split_assignment(doc_id: Column) -> Column:
    """Deterministic train/val/test split of a document id — the
    md5-bucket rule shared by text.corpus_train_split and
    dedup.corpus_split_leakage (ONE source of truth so the tag and its
    audits can never drift): bucket on the first 2 hex chars of
    md5(doc_id) — < 'f0' train (93.75%), < 'f8' val (3.125%), else
    test. Engine-reproducible across runs, partitionings and retries
    (a rand() split resamples on retry).

    DuckDB: ``CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
    < 'f0' THEN 'train' WHEN ... < 'f8' THEN 'val' ELSE 'test' END``
    (see SPLIT_ASSIGNMENT_SQL)."""
    bucket = F.substring(F.md5(doc_id.cast("string")), 1, 2)
    return (
        F.when(bucket < "f0", "train")
        .when(bucket < "f8", "val")
        .otherwise("test")
    )


def split_assignment_sql(doc_id: str) -> str:
    """DuckDB twin of :func:`split_assignment` over column ``doc_id``."""
    b = f"substring(md5(CAST({doc_id} AS VARCHAR)), 1, 2)"
    return (
        f"CASE WHEN {b} < 'f0' THEN 'train' "
        f"WHEN {b} < 'f8' THEN 'val' ELSE 'test' END"
    )


def zvalue_sql(x: str, y: str) -> str:
    """Morton/Z-order value of two 16-bit column expressions, as a SQL
    string with identical semantics in Spark SQL and DuckDB (plain
    BIGINT &, |, << — both engines produce the same interleave, pinned
    in tests). Used by io.write_zorder_parquet for multi-dimensional
    data clustering: range-partitioning + sorting on z keeps rows close
    in BOTH dimensions close in the file layout, so per-file min/max
    footer stats form tight bounding boxes and 2-D predicates prune
    files — the layout trick behind Delta/Iceberg Z-ORDER OPTIMIZE. At
    wider domains, scale/rank inputs into 16 bits first."""

    def spread(v: str) -> str:
        s = f"(CAST({v} AS BIGINT) & 65535)"
        for sh, m in (
            (8, 16711935),      # 0x00FF00FF
            (4, 252645135),     # 0x0F0F0F0F
            (2, 858993459),     # 0x33333333
            (1, 1431655765),    # 0x55555555
        ):
            s = f"(({s} | ({s} << {sh})) & {m})"
        return s

    return f"({spread(x)} | ({spread(y)} << 1))"
