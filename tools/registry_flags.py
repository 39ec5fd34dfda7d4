#!/usr/bin/env python3
"""Flag outsized wall growth across the FULL query registry.

Usage: python3 tools/registry_flags.py [bench/registry_sf1.json]

Reads a BENCH_ALL artifact (the whole registry timed at sf0.1 —
`queries`, median of 3 — and at the 10x sf1 tile — `sf1_queries`,
single timed run) and flags queries whose wall growth exceeds the
superlinear threshold the headline scale gate uses (10x data -> >20x
time), ignoring sub-noise walls (<0.5 s at sf1, where the ratio is
dominated by fixed per-query overhead, not data). Errors are always
surfaced. This is the wide net for the ~150 operators the 32-query
headline gates don't watch: a single-task sort or superlinear shuffle
hiding in a non-headline operator shows up here as a flagged ratio.
"""
import json
import sys

RATIO_MAX = 20.0   # 10x data -> >20x wall = superlinear (headline gate's bar)
MIN_WALL = 0.5     # below this at sf1 the ratio measures overhead, not data


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "bench/registry_sf1.json"
    with open(path) as f:
        d = json.load(f)
    errs = d.get("errors", {})
    for k, v in sorted(errs.items()):
        print(f"ERROR {k}: {v}")
    q01, q1 = d["queries"], d.get("sf1_queries", {})
    missing = sorted(set(q01) ^ set(q1))
    for m in missing:
        print(f"MISSING {m}: timed at only one SF")
    flagged = []
    for name in sorted(set(q01) & set(q1)):
        w0, w1 = q01[name], q1[name]
        if w1 < MIN_WALL or w0 <= 0:
            continue
        ratio = w1 / w0
        if ratio > RATIO_MAX:
            flagged.append((ratio, name, w0, w1))
    for ratio, name, w0, w1 in sorted(flagged, reverse=True):
        print(f"FLAG {name}: {w0:.2f}s -> {w1:.2f}s ({ratio:.1f}x for 10x data)")
    n = len(set(q01) & set(q1))
    top = sorted(((q1[k], k) for k in q1), reverse=True)[:8]
    print("slowest at sf1: " + ", ".join(f"{k}={v:.1f}s" for v, k in top))
    print(f"== {n} queries compared, {len(flagged)} flagged, "
          f"{len(errs)} errors, {len(missing)} missing ==")
    # missing is a gate failure too: an operator silently dropped from
    # one timing pass must not pass the wide net.
    if errs or flagged or missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
