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
  division THROWS where DuckDB yields NULL), an exact duplicate of an
  existing vector (cosine ties), a tiny-magnitude vector (1e-30 — norm
  underflow), a coordinate-axis vector.

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
    ]
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
        (list(rows[0]["embedding"]), rows[0]["label"]),  # exact dup: ties
        ([1e-30] * dim, 1),                  # norm underflow
        (axis, 2),                           # coordinate axis
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


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        shutil.copy(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
    documents()
    embeddings()
    print(f"adversarial SF written to {OUT}")


if __name__ == "__main__":
    main()
