#!/usr/bin/env python
"""Render trireme_spark/rows_only.py to ROWS_ONLY.json at the repo root.

Run after any registry change (new key, oracle added/removed) or a sweep
rotation, so the committed manifest always matches the live registry and
the current grading window's expected-green accounting.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trireme_spark.rows_only import manifest  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ROWS_ONLY.json",
)


def main() -> int:
    m = manifest()
    tmp = OUT + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=2, sort_keys=False)
        fh.write("\n")
    os.replace(tmp, OUT)
    w = m["current_window"]
    print(
        f"wrote {OUT}: {len(m['keys'])} rows-only keys; window "
        f"{w['first_key']}..{w['last_key']} expects "
        f"{w['expected_hash_green']} hash-green + "
        f"{len(w['expected_rows_only'])} rows-only "
        f"({', '.join(w['expected_rows_only']) or 'none'})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
