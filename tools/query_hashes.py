#!/usr/bin/env python3
"""AST-hash manifest of every registered query's implementing function,
bound to the driver round that last graded it.

Automates the `_REGRADE` policy (VERDICT r5 item 8, hardened per
VERDICT r6 item 2): the driver's CORRECTNESS grades certify a specific
implementation, so a query whose code changes after its latest grade
must be bumped in `__spark_entry__._REGRADE` for re-certification. The
manifest records, per query, the hash of the implementation's
docstring-free AST *as of its latest driver grade* plus that grade's
round number:

    {"q1_pricing_summary": {"hash": "ab12...", "graded_round": 6}, ...}

The companion test in tests/test_entry_order.py goes red whenever a
registered function's current hash differs from its hash-at-latest-
grade without a pending `_REGRADE` entry covering that grade.

Why the round number is stored (the round-6 lesson): the old flat
`{name: hash}` manifest re-baselined to *current* code on every
`--write`, so a code change + same-commit manifest refresh silently
absorbed an unbumped edit (the customers_rfm_segments case, VERDICT r6
"What's wrong" #2). Now `--write` only moves a graded query's recorded
hash when a CORRECTNESS file shows a grade NEWER than the recorded
`graded_round` — a refresh without a new grade keeps the
hash-at-latest-grade, so the tripwire still fires.

Workflow when changing a registered query's implementation:
1. make the change;
2. add `"<name>": <current latest graded round>` to `_REGRADE`;
3. leave the manifest alone — it keeps the hash the grade certified.
At the START of each round (right after the new CORRECTNESS_r*.json
lands, BEFORE touching query code), run
`python tools/query_hashes.py --write` so freshly re-graded queries
re-baseline to the code the driver just certified.

Limitation (documented, deliberate): the hash covers the registered
function's own source, not helpers it calls — a shared-helper rewrite
(the text_vocab_growth case this tripwire was born from) still needs
the builder to bump `_REGRADE` by hand. The tripwire catches the
common case: a direct edit to a query function that skips the policy.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import textwrap

MANIFEST = os.path.join(os.path.dirname(__file__), "query_hashes.json")


class _DropDocstrings(ast.NodeTransformer):
    def _strip(self, node):
        self.generic_visit(node)
        if (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    visit_FunctionDef = _strip
    visit_AsyncFunctionDef = _strip
    visit_ClassDef = _strip
    visit_Module = _strip


def query_source_hash(fn) -> str:
    """Stable 16-hex-digit hash of the function's docstring-free AST."""
    src = textwrap.dedent(inspect.getsource(inspect.unwrap(fn)))
    tree = _DropDocstrings().visit(ast.parse(src))
    return hashlib.sha256(
        ast.dump(tree).encode("utf-8")
    ).hexdigest()[:16]


def _entry_mod():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    return entry_mod


def current_hashes() -> dict[str, str]:
    entry_mod = _entry_mod()
    return {
        name: query_source_hash(fn)
        for name, fn in entry_mod.queries().items()
    }


def recorded_manifest() -> dict[str, dict]:
    """{name: {"hash": str, "graded_round": int}} as recorded."""
    with open(MANIFEST) as fh:
        return json.load(fh)


def recorded_hashes() -> dict[str, str]:
    """Recorded hash-at-latest-grade per query (the tripwire's truth)."""
    return {n: row["hash"] for n, row in recorded_manifest().items()}


def merge_manifest(
    cur: dict[str, str],
    rec: dict[str, dict],
    graded: dict[str, int],
) -> dict[str, dict]:
    """Pure `--write` merge rule (unit-tested in test_entry_order.py).

    Per registered query:
    - never graded -> track current code freely (no grade to protect);
    - a grade NEWER than the recorded graded_round landed -> the driver
      certified the current code; re-baseline hash + round to it;
    - otherwise -> KEEP the recorded hash-at-latest-grade, even if the
      current code drifted (that drift is exactly what the tripwire
      must keep seeing until a new grade lands).
    Ghost entries (no longer registered) are dropped.
    """
    out: dict[str, dict] = {}
    for name, cur_hash in cur.items():
        latest = graded.get(name, 0)
        old = rec.get(name)
        if old is None or latest == 0 or latest > old.get("graded_round", 0):
            out[name] = {"hash": cur_hash, "graded_round": latest}
        else:
            out[name] = {
                "hash": old["hash"],
                "graded_round": old["graded_round"],
            }
    return out


def main() -> None:
    cur = current_hashes()
    graded = _entry_mod()._grading_history()
    try:
        rec = recorded_manifest()
    except FileNotFoundError:
        rec = {}
    if "--write" in sys.argv:
        merged = merge_manifest(cur, rec, graded)
        kept = sorted(
            n
            for n in merged
            if merged[n]["hash"] != cur[n]
        )
        with open(MANIFEST, "w") as fh:
            json.dump(merged, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(merged)} entries to {MANIFEST}")
        if kept:
            print(
                "kept hash-at-latest-grade (code drifted, no newer "
                f"grade — needs a _REGRADE bump): {kept}"
            )
        return
    drift = sorted(
        set(n for n in cur if cur[n] != rec.get(n, {}).get("hash"))
        | (set(rec) - set(cur))
    )
    print(json.dumps(drift))
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
