"""Regenerate CERTIFIED.json — the machine-checkable driver-ledger:
query name -> LATEST round whose driver CORRECTNESS_r{N}.json recorded
a green row (hash_match, or rows_match for rows-only checks; rows with
an err never certify). Latest, not first (changed r8, VERDICT r7 task
#6): the ledger answers "how stale is this query's newest driver
validation?", which is what window rotation minimizes — no query's
most recent row should predate several rounds of engine churn.

Run after each round's CORRECTNESS file lands. The gate
(tests/test_registry.py::test_every_query_windowed_or_certified)
asserts every registered query is either in the current DRIVER_WINDOW
(certification pending this round) or already has a recorded round —
so window rotation can never silently drop a query out of the ledger.

Usage: python scripts/certified_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "CERTIFIED.json")


def build() -> dict[str, int]:
    cert: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for q, row in data.items():
            green = row.get("err") is None and (
                row.get("hash_match") is True
                or (row.get("hash_match") is None and row.get("rows_match") is True)
            )
            if green:
                cert[q] = max(cert.get(q, 0), rnd)
    return dict(sorted(cert.items()))


if __name__ == "__main__":
    cert = build()
    with open(OUT, "w") as fh:
        json.dump(cert, fh, indent=1)
        fh.write("\n")
    print(f"wrote {len(cert)} certified queries to {OUT}")
