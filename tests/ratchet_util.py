"""AST-based site extraction shared by the broadcast / driver-transfer
ratchets (tests/test_broadcast_ratchet.py, tests/test_collect_ratchet.py).

Why AST, not regex (r8 ADVICE, both findings):

* regex counted matches inside comments and docstrings, which could both
  false-trip a pin and quietly absorb a real new site under an inflated
  pin; `ast.parse` sees only code.
* raw per-file counts cannot detect a same-file swap — removing one
  audited site and adding a new unaudited one leaves the count
  unchanged. The pin here is a per-file multiset of ENCLOSING-SCOPE
  qualnames (``Counter``): a swap between functions changes the
  multiset and fails the ratchet, which is exactly the moment the new
  site must be audited. A swap within one function body still evades —
  accepted: audit notes are per-function, so the audited claim ("this
  function broadcasts a bounded frame") still covers the new site.
"""

from __future__ import annotations

import ast
import os
import re
from collections import Counter
from typing import Callable

ROOT = os.path.join(os.path.dirname(__file__), "..", "trireme_spark")


def is_f_broadcast(call: ast.Call) -> bool:
    """``F.broadcast(...)`` — the explicit broadcast-hint surface."""
    f = call.func
    return (
        isinstance(f, ast.Attribute)
        and f.attr == "broadcast"
        and isinstance(f.value, ast.Name)
        and f.value.id == "F"
    )


def _is_pandas_receiver(recv: ast.expr) -> bool:
    """Anchored pandas-frame naming convention (r10 ADVICE: the old
    unanchored ``|pandas`` alternative exempted ANY name merely
    containing 'pandas', e.g. a Spark DF named ``pandas_like``).
    Matches ``pdf``, ``pdf2``, ``x_pdf``, ``pandas``, ``pandas_batch``
    — a full trailing token, never a substring."""
    return isinstance(recv, ast.Name) and re.search(
        r"(?:^|_)(?:pdf\d*|pandas\w*)$", recv.id
    ) is not None


def is_driver_transfer(call: ast.Call) -> bool:
    """``.collect()`` / ``.toPandas()`` / ``.first()`` (zero-arg),
    ``.head(...)``, ``.take(...)`` and ``.toLocalIterator(...)`` — the
    driver-materialization surface (r9 ADVICE added the last two:
    both move rows to the driver just like collect). ``F.first(col)``
    (the JVM aggregate) is excluded by the zero-arg rule and the
    receiver check. Calls on a pandas-looking receiver (``pdf``,
    ``*_pdf``, ``pandas*``-named) are excluded for ``.head`` AND
    ``.take`` (r10 ADVICE: pandas also has ``.take(indices)``, so an
    executor-side ``pdf.take(...)`` inside an Arrow UDF must not
    false-trip) — a heuristic, so name executor-side pandas frames
    accordingly. ``.toLocalIterator`` gets no exclusion on purpose:
    pandas has no such method, so any receiver is a Spark DF."""
    f = call.func
    if not isinstance(f, ast.Attribute):
        return False
    if isinstance(f.value, ast.Name) and f.value.id == "F":
        return False  # F.first / F.head are JVM-side expressions
    if f.attr in ("collect", "toPandas", "first"):
        return not call.args and not call.keywords
    if f.attr == "toLocalIterator":
        return True
    if f.attr in ("take", "head"):
        return not _is_pandas_receiver(f.value)
    return False


def file_signatures(path: str, select: Callable[[ast.Call], bool]) -> Counter:
    """Per-enclosing-scope qualname counts of matching Call sites."""
    tree = ast.parse(open(path).read())
    out: Counter = Counter()
    stack: list[str] = []

    class V(ast.NodeVisitor):
        def _scope(self, node):
            stack.append(node.name)
            self.generic_visit(node)
            stack.pop()

        visit_FunctionDef = _scope
        visit_AsyncFunctionDef = _scope
        visit_ClassDef = _scope

        def visit_Call(self, node: ast.Call):
            if select(node):
                out[".".join(stack) or "<module>"] += 1
            self.generic_visit(node)

    V().visit(tree)
    return out


def tree_signatures(select: Callable[[ast.Call], bool]) -> dict[str, dict[str, int]]:
    """{relpath: {qualname: count}} over all non-test package source."""
    got: dict[str, dict[str, int]] = {}
    for dirpath, _dirs, files in os.walk(ROOT):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
            sig = file_signatures(path, select)
            if sig:
                got[rel] = dict(sorted(sig.items()))
    return got


def diff_signatures(
    audited: dict[str, dict[str, int]], got: dict[str, dict[str, int]]
) -> tuple[dict, dict]:
    """(new_sites, gone_sites) as {file: {qualname: delta}} maps."""
    new: dict[str, dict[str, int]] = {}
    gone: dict[str, dict[str, int]] = {}
    for f in sorted(set(audited) | set(got)):
        a, g = Counter(audited.get(f, {})), Counter(got.get(f, {}))
        plus = {q: n for q, n in (g - a).items()}
        minus = {q: n for q, n in (a - g).items()}
        if plus:
            new[f] = plus
        if minus:
            gone[f] = minus
    return new, gone


if __name__ == "__main__":  # pin regeneration helper
    import json
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "broadcast"
    sel = is_f_broadcast if which == "broadcast" else is_driver_transfer
    print(json.dumps(tree_signatures(sel), indent=1))
