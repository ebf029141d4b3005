"""Operator surface: relational queries, dedup, similarity, text, multimodal.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLE: dict[str, str]`` (DuckDB-equivalent ANSI SQL; keys missing from
ORACLE are genuinely non-SQL-expressible and get a rows-only check).
"""
