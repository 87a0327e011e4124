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

import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "trireme_spark")

# The §2 API-surface demonstration module is the ONLY place row-Python
# UDFs may appear.
ALLOWED = {"queries/udfs.py"}

_PAT = re.compile(r"F\.udf\(|\budf\.register\(")


def test_row_python_udfs_quarantined():
    offenders: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
            if rel in ALLOWED:
                continue
            n = len(_PAT.findall(open(path).read()))
            if n:
                offenders[rel] = n
    assert not offenders, (
        f"Row-Python UDF sites outside queries/udfs.py: {offenders}. "
        "Use built-in pyspark.sql.functions or an Arrow-batched pandas "
        "UDF instead; row UDFs are quarantined to the §2 API-surface "
        "module."
    )
