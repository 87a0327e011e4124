"""Row-Python-UDF ratchet: the slow path stays quarantined.

Doctrine: row-at-a-time Python UDFs (`F.udf`, `spark.udf.register` of a
plain Python fn) exist ONLY where SURVEY §2 demands the API surface
itself (x1 `udf_python`, `udf_sql_registered`) — everywhere else the
hot path is built-in functions (whole-stage codegen) or Arrow-batched
pandas UDFs. A row UDF leaking into an operator module is a 10-100×
regression at 100 TB that no sf0.01 correctness gate notices; this pin
fails the suite the moment one appears outside the quarantine module.
"""

from __future__ import annotations

import ast

from tests.ratchet_util import tree_signatures

# The §2 API-surface demonstration module is the ONLY place row-Python
# UDFs may appear.
ALLOWED = {"queries/udfs.py"}


def _is_row_udf(call: ast.Call) -> bool:
    # F.udf(...) or <anything>.udf.register(...) — AST-extracted so a
    # docstring mentioning F.udf cannot false-trip the quarantine
    # (same r8 ADVICE rationale as the broadcast/collect ratchets).
    f = call.func
    if not isinstance(f, ast.Attribute):
        return False
    if (
        f.attr == "udf"
        and isinstance(f.value, ast.Name)
        and f.value.id == "F"
    ):
        return True
    return (
        f.attr == "register"
        and isinstance(f.value, ast.Attribute)
        and f.value.attr == "udf"
    )


def test_row_python_udfs_quarantined():
    offenders = {
        rel: dict(sig)
        for rel, sig in tree_signatures(_is_row_udf).items()
        if rel not in ALLOWED
    }
    assert not offenders, (
        f"Row-Python UDF sites outside queries/udfs.py: {offenders}. "
        "Use built-in pyspark.sql.functions or an Arrow-batched pandas "
        "UDF instead; row UDFs are quarantined to the §2 API-surface "
        "module."
    )
