#!/usr/bin/env python
"""Regenerate docs/QUERIES.md from the suite registration + docstrings."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otters_spark.suite import ORACLE_SQL, QUERIES  # noqa: E402

HEADER = """# Query index

Every driver-contract query (`__spark_entry__.queries()`), its check
type, and what it demonstrates. Generated from suite docstrings
(`python scripts/gen_query_index.py`).

**Frozen-registry contract (round 8):** rows 1-50 are the driver's
correctness window — the per-round recorder samples exactly the FIRST
50 registry entries, and the registry order in `otters_spark/suite.py`
was frozen in round 8 (verification-priority order, marker comments at
the `_REGISTRY` block). Do NOT reorder it: a reorder silently swaps
which queries get driver-recorded rows and breaks cross-round
comparability of `CORRECTNESS_r*.json`. Rows 51+ never get driver rows
again; their current-code correctness statement is the mandatory
per-round full sweep (`python scripts/check_oracle.py` at sf0.001 /
0.01 / 0.1, summarized in each `ROUND*_NOTES.md`).

| # | query | check | demonstrates |
|---|---|---|---|
"""


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    m = re.split(r"(?<=[.!?])\s", text, maxsplit=1)
    s = m[0].rstrip(".")
    return (s[:110] + "...") if len(s) > 113 else s


def main() -> None:
    out = [HEADER]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        check = "DuckDB oracle" if name in ORACLE_SQL else "rows-only"
        out.append(f"| {i} | `{name}` | {check} | {first_sentence(fn.__doc__)} |\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "QUERIES.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
