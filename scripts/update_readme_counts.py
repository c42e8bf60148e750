"""Regenerate the README's derived numbers from the ground truth so
they can never lag the code (the r9 VERDICT caught a hand-maintained
"235 entries" surviving part of a round):

- the registry count comes from ``len(QUERIES)``;
- the per-round bench table (raw total + host probe + median
  per-query ratio; the noisy ``value_normalized_32c`` stays in the
  JSON records only — r13 verdict) is rebuilt from the committed
  ``BENCH_r*.json`` records between the ``<!-- bench-table -->``
  markers.

Run after adding entries or landing a bench record:
``python scripts/update_readme_counts.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_rows() -> list[str]:
    rows = []
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    # the builder's own full record for the round IN PROGRESS — the
    # driver's BENCH_r<N>.json lands only after the round closes
    local = os.path.join(REPO, "BENCH_local.json")
    if os.path.exists(local):
        paths.append(local)
    for path in paths:
        m_r = re.search(r"BENCH_r(\d+)\.json", path)
        rnd = m_r.group(1) if m_r else None
        with open(path) as fh:
            raw = fh.read()
        try:
            doc = json.loads(raw)
        except json.JSONDecodeError:
            continue
        # driver records wrap the (tail-truncated) JSON line in
        # {"tail": ..., "parsed": ...} — recover the flat trailing
        # fields and the per-query map individually, since the head of
        # the line (and so any full-object parse) may be cut off.
        if "value" not in doc and isinstance(doc.get("tail"), str):
            tail = doc["tail"]
            doc = {}
            for key in ("value", "value_normalized_32c", "sf", "median_ratio_vs_prev", "ratio_n_common"):
                m = re.search(rf'"{key}": ([0-9.]+)', tail)
                if m:
                    doc[key] = float(m.group(1))
            # baseline labels carry a suffix since r11 ("r11 (full
            # local snapshot)") — capture the round, keep the cell tidy
            m = re.search(r'"ratio_baseline": "(r\d+)[^"]*"', tail)
            if m:
                doc["ratio_baseline"] = m.group(1)
            # r10+ probes are nested (pre/post); the OUTER mean is the
            # LAST "effective_cores" occurrence in the line
            effs = re.findall(r'"effective_cores": ([0-9.]+)', tail)
            if effs:
                doc["host_probe"] = {"effective_cores": float(effs[-1])}
            # the tail preserves only the last ~2000 chars, so the
            # per-query count is a LOWER bound for wrapped records —
            # unless a committed full local snapshot holds the SAME
            # record (identical headline value), in which case its
            # complete per-query map gives the exact count.
            n_tail = len(re.findall(r'"[a-z0-9_]+": [0-9.]+,', tail))
            # ratio_n_common (common entries with the previous round's
            # full snapshot) is a far tighter lower bound than the
            # truncated tail's surviving pairs
            if doc.get("ratio_n_common"):
                n_tail = max(n_tail, int(doc["ratio_n_common"]))
            doc["n_queries"] = f"≥{n_tail}" if n_tail else "—"
            for snap in glob.glob(os.path.join(REPO, "BENCH_local_r*.json")):
                try:
                    with open(snap) as sf:
                        sdoc = json.load(sf)
                except (OSError, json.JSONDecodeError):
                    continue
                if sdoc.get("value") == doc.get("value") and sdoc.get(
                    "queries"
                ):
                    doc["n_queries"] = len(sdoc["queries"])
                    break
        if "value" not in doc:
            continue
        n_q = doc.get("n_queries") or len(doc.get("queries", {})) or "—"
        probe = doc.get("host_probe") or {}
        eff = probe.get("effective_cores")
        label = f"r{int(rnd)}" if rnd else "local (this round)"
        ratio = doc.get("median_ratio_vs_prev")
        base = doc.get("ratio_baseline")
        n_common = doc.get("ratio_n_common")
        if ratio is not None:
            ratio_cell = f"{ratio}× vs {base or '?'}"
            if n_common:
                ratio_cell += f" (n={int(n_common)})"
        else:
            ratio_cell = "—"
        rows.append(
            f"| {label} | {doc['value']} | {n_q} | "
            f"{eff if eff is not None else '—'} | {ratio_cell} |"
        )
    return rows


def main() -> None:
    readme = os.path.join(REPO, "README.md")
    src = open(readme).read()

    from glamira_end_to_end_data_pipeline_spark.plans import QUERIES

    n = len(QUERIES)
    src, cnt = re.subn(
        r"\(\d+ entries, every one with a", f"({n} entries, every one with a", src
    )
    assert cnt == 1, "registry-count anchor not found exactly once"

    table = "\n".join(
        [
            "| round | raw total (s) | queries | effective cores | "
            "median per-query ratio |",
            "|---|---|---|---|---|",
            *bench_rows(),
        ]
    )
    block = f"<!-- bench-table -->\n{table}\n<!-- /bench-table -->"
    if "<!-- bench-table -->" in src:
        src = re.sub(
            r"<!-- bench-table -->.*?<!-- /bench-table -->",
            block,
            src,
            flags=re.S,
        )
    else:
        anchor = "## Contract changes"
        src = src.replace(
            anchor,
            "Per-round headline totals (raw vs host-normalized — compare the\n"
            "NORMALIZED column across rounds; raw totals track the sandbox's\n"
            "machine share as much as the code; rounds ≤8 predate the probe):\n\n"
            + block
            + "\n\n"
            + anchor,
        )
    open(readme, "w").write(src)
    print(f"README refreshed: {n} entries, {len(bench_rows())} bench rows")


if __name__ == "__main__":
    main()
