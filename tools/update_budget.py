#!/usr/bin/env python3
"""Regenerate bench/shuffle_budget.txt from a bench JSON line.

Usage: run Bench at sf0.1 with SPARK_GRAFT_CPUS=32, capture the JSON
line, then:  python3 tools/update_budget.py <bench.json>
Only do this when a plan change is INTENTIONAL — the budget is the
regression baseline.
"""
import json
import sys
from pathlib import Path

HEADER = """\
# Per-query shuffle bytes written at sf0.1 (deterministic task-metric
# sums, recorded at SPARK_GRAFT_CPUS=32; the gate is armed only there).
# Regenerate: python3 tools/update_budget.py <bench json line file>
"""

def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"
    with open(path) as f:
        data = json.load(f)
    if not data.get("sf", "").endswith("sf0.1"):
        sys.exit(f"refusing: bench ran at {data.get('sf')} (budget is sf0.1-only)")
    rows = sorted(data["shuffle_bytes"].items())
    # anchor to the repo root (this script's parent's parent), not the
    # CWD: run from elsewhere, a CWD-relative path would silently write
    # a new file while Bench keeps reading the stale committed budget
    out = Path(__file__).resolve().parent.parent / "bench" / "shuffle_budget.txt"
    with open(out, "w") as f:
        f.write(HEADER)
        for name, byts in rows:
            f.write(f"{name} {byts}\n")
    print(f"wrote {len(rows)} budget lines")

if __name__ == "__main__":
    main()
