#!/usr/bin/env python
"""Round-start helper: turn the driver's CORRECTNESS_r{N}.json into the
registry bookkeeping `plans/__init__.py` needs each round.

Usage: python scripts/fold_round.py CORRECTNESS_r08.json

Prints, ready to paste:
  1. the `_R{N}_GREEN` frozenset literal (every entry whose round-N
     grade is fully green: rows + schema + hash where an oracle ran),
  2. the RED list (anything not fully green — these must be FIXED and
     then front-loaded into `_ROTATE_FIRST_R{N+1}` so the fix is
     re-graded the round it lands),
  3. the staleness report over the CURRENT registry: per-round counts
     of latest-green, plus the oldest entries next in line for the
     rotation window tail.

Keeping this in a script (instead of hand-editing frozensets from the
JSON) removes the copy error class entirely: a mistyped entry name in
`_R{N}_GREEN` silently mis-sorts the rotation forever.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    path = sys.argv[1]
    m = re.search(r"r(\d+)", path)
    if not m:
        print(
            f"error: cannot parse round number (r<digits>) from {path!r}; "
            "a silent round-0 default would drop green entries from the "
            "rotation-candidate list",
            file=sys.stderr,
        )
        return 2
    rnd = int(m.group(1))
    doc = json.load(open(path))

    def is_green(v: dict) -> bool:
        if v.get("err"):
            return False
        checks = [v.get("rows_match"), v.get("schema_match"), v.get("hash_match")]
        return all(c is not False for c in checks) and any(
            c is True for c in checks
        )

    green = sorted(n for n, v in doc.items() if is_green(v))
    red = sorted(n for n, v in doc.items() if not is_green(v))

    print(f"# {len(green)} green / {len(red)} red in {path}\n")
    print(f"_R{rnd}_GREEN = frozenset(")
    print("    {")
    # preserve the driver's grading order for readability, 4-wide sets
    for n, v in doc.items():
        if is_green(v):
            print(f'        "{n}",')
    print("    }")
    print(")")
    if red:
        print(f"\n# RED — fix, then front-load into _ROTATE_FIRST_R{rnd + 1}:")
        for n in red:
            v = doc[n]
            why = v.get("err") or ", ".join(
                k for k in ("rows_match", "schema_match", "hash_match")
                if v.get(k) is False
            )
            print(f"#   {n}: {why}")

    # staleness report against the live registry
    try:
        sys.path.insert(0, ".")
        import glamira_end_to_end_data_pipeline_spark.plans as pl

        def last(n: str) -> int:
            g = pl._last_graded(n)
            return rnd if n in set(green) else g

        names = list(pl.QUERIES)
        from collections import Counter

        dist = Counter(last(n) for n in names)
        print(f"\n# staleness after folding (latest-green round -> count):")
        print(f"#   {dict(sorted(dist.items()))}")
        oldest = sorted(
            (n for n in names if last(n) > 0), key=lambda n: last(n)
        )[:30]
        print(f"# next 30 for the window tail: {oldest}")
    except Exception as e:  # registry import is best-effort here
        print(f"# (staleness report skipped: {e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
