#!/usr/bin/env python
"""Mechanical start-of-round sweep rotation for _SWEEP_PRIORITY.

The driver grades the FIRST 50 keys of
trireme_spark/queries/__init__.py:_SWEEP_PRIORITY on the round's final
tree, so each round STARTS by rotating: the just-graded window moves to
a new "latest driver row: r{N}" tail section and the next keys advance.
Doing this by hand risks silently corrupting the window (losing a key,
duplicating one, breaking the never-swept ordering); this script does
the one legal transformation and verifies the invariants.

Usage:
  python scripts/rotate_sweep.py --graded-round 8          # rotate for r9
  python scripts/rotate_sweep.py --graded-round 8 --dry-run

It moves the current slots 1-50 to the back under a section comment
naming the graded round, preserves every other key's relative order
(the never-swept backlog advances into the window automatically), and
asserts: same key multiset before/after, window = previous slots 51-100,
no duplicates. It rewrites ONLY the list body between the markers; the
header comment above the list should be updated by hand to describe the
new round's window.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "trireme_spark",
    "queries",
    "__init__.py",
)
WINDOW = 50


def parse_keys(body: str) -> list[str]:
    keys = []
    for line in body.splitlines():
        m = re.match(r'"([^"]+)",', line.strip())
        if m:
            keys.append(m.group(1))
    return keys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graded-round", type=int, required=True,
                    help="round number whose CORRECTNESS graded the "
                         "current slots 1-50")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    src = open(PATH).read()
    m = re.search(r"_SWEEP_PRIORITY = \[(.*?)\n\]", src, re.S)
    if not m:
        print("could not locate _SWEEP_PRIORITY", file=sys.stderr)
        return 2
    body = m.group(1)
    keys = parse_keys(body)
    if len(keys) != len(set(keys)):
        print("duplicate keys in current list", file=sys.stderr)
        return 2

    graded, rest = keys[:WINDOW], keys[WINDOW:]

    # Line-wise rewrite so the tail's staleness-section comments
    # (r3/r4/... markers) survive: drop only the comments attached to
    # the outgoing window (those describe a window that no longer
    # exists), keep everything from the 51st key on verbatim, then
    # append the graded block under its new staleness marker. Retained
    # comments that pin absolute slot ranges ("slots 51-179") would be
    # stale the moment the list shifts by 50, so those are dropped too
    # (r8 ADVICE); round-marker comments carry no slot arithmetic and
    # stay.
    kept: list[str] = []
    seen = 0
    comment_block: list[str] = []

    def flush_comments() -> None:
        # Within a tail comment block, drop only the LINES that carry
        # absolute slot arithmetic ("slots 51-179" goes stale the moment
        # the list shifts); round markers like "latest driver row: r5"
        # stay even when the same block mixes both kinds (r9 ADVICE —
        # previously a mixed block was discarded wholesale, silently
        # losing its round marker).
        kept.extend(
            c for c in comment_block if not re.search(r"slots \d+", c)
        )
        comment_block.clear()

    for line in body.splitlines():
        s = line.strip()
        if re.match(r'"([^"]+)",', s):
            seen += 1
            if seen > WINDOW:
                flush_comments()
                kept.append(line)
            else:
                comment_block.clear()  # old-window comments: drop
        elif seen >= WINDOW and s:
            comment_block.append(line)
        # comments while seen < WINDOW described the old window: drop
    flush_comments()

    lines = [
        f"    # --- slots 1-{WINDOW}: the r{args.graded_round + 1} "
        "grading window (advanced mechanically by",
        "    # scripts/rotate_sweep.py; relative order preserved from "
        "the prior list) ---",
    ]
    lines.extend(kept)
    lines.append(
        f"    # -- latest driver row: r{args.graded_round} (the "
        f"{WINDOW} keys CORRECTNESS_r{args.graded_round:02d} "
        "graded) --"
    )
    lines.extend(f'    "{k}",' for k in graded)
    new_body = "\n" + "\n".join(lines)

    # invariants
    out_keys = parse_keys(new_body)
    assert sorted(out_keys) == sorted(keys), "key multiset changed"
    assert out_keys[:WINDOW] == keys[WINDOW : 2 * WINDOW], (
        "new window is not the previous slots 51-100"
    )
    assert out_keys[-WINDOW:] == graded, "graded window not at the back"

    if args.dry_run:
        print(f"would rotate: new slots 1-{WINDOW} =")
        for k in out_keys[:WINDOW]:
            print(f"  {k}")
        return 0

    # Atomic replace (r8 ADVICE): a mid-write interruption must not
    # truncate the package __init__.
    tmp = PATH + ".rotate.tmp"
    with open(tmp, "w") as fh:
        fh.write(src[: m.start(1)] + new_body + src[m.end(1):])
    os.replace(tmp, PATH)
    print(
        f"rotated: r{args.graded_round} window moved to the back; "
        f"new window starts {out_keys[0]} .. {out_keys[WINDOW-1]}"
    )
    print("NOTE: update the header comment above _SWEEP_PRIORITY and "
          "re-run the window through scripts/driver_sim.py before "
          "committing.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
