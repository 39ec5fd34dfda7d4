#!/usr/bin/env python3
"""Flag outsized wall growth across the FULL query registry.

Usage: python3 tools/registry_flags.py [bench/registry_sf01.json bench/registry_sf1.json]

Reads two BENCH_ALL artifacts (the whole registry timed at sf0.1 and at
the sf1 tile — 10x the data) and flags queries whose wall growth
exceeds the superlinear threshold the headline scale gate uses (10x
data -> >20x time), ignoring sub-noise walls (<0.5 s at sf1, where a
ratio is dominated by fixed per-query overhead, not data). Errors in
either artifact are always surfaced. This is the wide net for the
~150 operators the 32-query headline gates don't watch: a single-task
sort or superlinear shuffle hiding in a non-headline operator shows up
here as a flagged ratio.
"""
import json
import sys

RATIO_MAX = 20.0   # 10x data -> >20x wall = superlinear (headline gate's bar)
MIN_WALL = 0.5     # below this at sf1 the ratio measures overhead, not data


def main() -> None:
    sf01_path = sys.argv[1] if len(sys.argv) > 2 else "bench/registry_sf01.json"
    sf1_path = sys.argv[2] if len(sys.argv) > 2 else "bench/registry_sf1.json"
    with open(sf01_path) as f:
        sf01 = json.load(f)
    with open(sf1_path) as f:
        sf1 = json.load(f)
    errs = {**{f"sf0.1:{k}": v for k, v in sf01.get("errors", {}).items()},
            **{f"sf1:{k}": v for k, v in sf1.get("errors", {}).items()}}
    for k, v in sorted(errs.items()):
        print(f"ERROR {k}: {v}")
    q01, q1 = sf01["queries"], sf1["queries"]
    missing = sorted(set(q01) ^ set(q1))
    for m in missing:
        print(f"MISSING {m}: present in only one artifact")
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
    print(f"== {n} queries compared, {len(flagged)} flagged, "
          f"{len(errs)} errors, {len(missing)} missing ==")
    if errs or flagged:
        sys.exit(1)


if __name__ == "__main__":
    main()
