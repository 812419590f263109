"""Emit GATE_STATUS.json — the one-file gate-coverage audit.

Round-10 VERDICT next #7: auditing "has every query ever been driver-
gated, and how stale is its newest row?" used to require aggregating
every ``CORRECTNESS_r*.json`` by hand. This tool does that aggregation
mechanically and writes a single artifact:

  {
    "corpus_size": N,
    "rounds_seen": [1, 2, ...],
    "per_query": {name: {"latest_round": r, "latest_green": bool,
                          "rounds": [..]} | {"latest_round": null, ...}},
    "never_gated": [...],          # no driver row anywhere
    "pending": [...],              # registry.GATE_PENDING
    "current_window": [...],       # registry.GATE_WINDOW (next 50 rows)
    "latest_red": [...],           # newest driver row not hash-green
    "oldest": [[name, round], ...] # stalest 20, rotation shortlist
  }

Run from the repo root:  python tools/gate_status.py
A suite test (tests/test_registry_order.py) regenerates and re-asserts
the artifact so it cannot drift from the CORRECTNESS history.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_status(repo: str = REPO) -> dict:
    sys.path.insert(0, repo)
    from pipegen_spark.queries.registry import (
        GATE_PENDING,
        GATE_WINDOW,
        all_queries,
    )

    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)

    qs = list(all_queries())
    per_query: dict[str, dict] = {}
    for name in qs:
        hist = sorted(r for r, data in rounds.items() if name in data)
        if hist:
            latest = hist[-1]
            row = rounds[latest][name]
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            per_query[name] = {
                "latest_round": latest,
                "latest_green": green,
                "rounds": hist,
            }
        else:
            per_query[name] = {
                "latest_round": None,
                "latest_green": False,
                "rounds": [],
            }

    never = [n for n, v in per_query.items() if v["latest_round"] is None]
    latest_red = [
        n
        for n, v in per_query.items()
        if v["latest_round"] is not None and not v["latest_green"]
    ]
    gated = [
        (n, v["latest_round"])
        for n, v in per_query.items()
        if v["latest_round"] is not None
    ]
    gated.sort(key=lambda t: (t[1], t[0]))

    return {
        "corpus_size": len(qs),
        "rounds_seen": sorted(rounds),
        "per_query": per_query,
        "never_gated": sorted(never),
        "pending": list(GATE_PENDING),
        "current_window": list(GATE_WINDOW),
        "latest_red": sorted(latest_red),
        "oldest": [[n, r] for n, r in gated[:20]],
    }


def main() -> None:
    status = build_status()
    out = os.path.join(REPO, "GATE_STATUS.json")
    with open(out, "w") as fh:
        json.dump(status, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(
        f"GATE_STATUS.json: corpus={status['corpus_size']} "
        f"never_gated={len(status['never_gated'])} "
        f"pending={status['pending']} "
        f"latest_red={len(status['latest_red'])}"
    )
    by_round: dict[int, int] = {}
    for v in status["per_query"].values():
        if v["latest_round"] is not None:
            by_round[v["latest_round"]] = by_round.get(v["latest_round"], 0) + 1
    for r in sorted(by_round):
        print(f"  r{r:02d}: {by_round[r]} queries' newest row")


if __name__ == "__main__":
    main()
