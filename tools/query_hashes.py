#!/usr/bin/env python3
"""AST-hash manifest of every registered query's implementing function.

Automates the `_REGRADE` policy (VERDICT r5 item 8): the driver's
CORRECTNESS grades certify a specific implementation, so a query whose
code changes after its latest grade must be bumped in
`__spark_entry__._REGRADE` for re-certification. The manifest records a
hash of each implementation's AST (comments don't count; docstrings are
stripped too — neither changes the physical plan); the companion test in
tests/test_entry_order.py goes red when a hash drifts from the manifest
without a pending `_REGRADE` entry covering that query.

Workflow when changing a registered query's implementation:
1. make the change;
2. add `"<name>": <current latest graded round>` to `_REGRADE`;
3. run `python tools/query_hashes.py --write` to refresh the manifest
   (same commit — the diff shows the bump and the refresh together).

Limitation (documented, deliberate): the hash covers the registered
function's own source, not helpers it calls — a shared-helper rewrite
(the text_vocab_growth case this tripwire was born from) still needs the
builder to bump `_REGRADE` by hand. The tripwire catches the common
case: a direct edit to a query function that skips the policy.
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


def current_hashes() -> dict[str, str]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    return {
        name: query_source_hash(fn)
        for name, fn in entry_mod.queries().items()
    }


def recorded_hashes() -> dict[str, str]:
    with open(MANIFEST) as fh:
        return json.load(fh)


def main() -> None:
    cur = current_hashes()
    if "--write" in sys.argv:
        with open(MANIFEST, "w") as fh:
            json.dump(cur, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(cur)} hashes to {MANIFEST}")
        return
    rec = recorded_hashes()
    drift = sorted(
        set(n for n in cur if cur[n] != rec.get(n))
        | (set(rec) - set(cur))
    )
    print(json.dumps(drift))
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
