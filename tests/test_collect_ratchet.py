"""Driver-transfer ratchet: no NEW `.collect()`/`.toPandas()`/`.first()`
may appear in non-test source unaudited.

Companion to tests/test_broadcast_ratchet.py. The scale doctrine is that
driver state must be BOUNDED MODEL STATE — k centroids, a d×d moment
matrix, a merge-table page, a k-row shortlist — never anything that
grows with corpus row count (a driver-side loop over collected corpus
rows is the definition of a non-distributed operator). The r7 verdict
spot-verified all sites by hand (64×64 Procrustes moments, literal-
bounded binary staging, BPE top-page, 20-row MMR shortlist); this pin
makes the next new site fail the default suite until it is consciously
audited as bounded, with the audit note next to its count below.
"""

from __future__ import annotations

import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "trireme_spark")

_PAT = re.compile(r"\.collect\(\)|\.toPandas\(\)|\.first\(\)|\.head\(")

# file (relative to trireme_spark/) -> audited driver-transfer count.
AUDITED = {
    "operators/clustering.py": 3,  # k seed/centroid rows per iter
    "operators/similarity.py": 1,  # sampled LSH hyperplanes (h×d)
    "queries/aggregates.py": 1,  # 1-row min(ym) anchor
    "queries/llm_sim.py": 1,  # 20-row MMR shortlist
    "queries/pipeline.py": 4,  # d×d gram/Procrustes moments, 1-row mse
    "queries/scans.py": 2,  # 1-row max key + literal binary staging
    "queries/training.py": 2,  # BPE top-page + vocab-bounded merges
}


def _counts() -> dict[str, int]:
    got: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
            n = len(_PAT.findall(open(path).read()))
            if n:
                got[rel] = n
    return got


def test_no_unaudited_driver_transfers():
    got = _counts()
    new = {f: n for f, n in got.items() if n > AUDITED.get(f, 0)}
    assert not new, (
        f"NEW driver-transfer sites beyond the audited pin: {new}. "
        "Verify each new collect/toPandas/first holds BOUNDED model "
        "state (size independent of corpus rows), then re-bless its "
        "count in tests/test_collect_ratchet.py with an audit note."
    )
    gone = {f: n for f, n in AUDITED.items() if got.get(f, 0) < n}
    assert not gone, (
        f"Audited driver-transfer counts are stale: {gone}. Lower the "
        "pins in tests/test_collect_ratchet.py."
    )
