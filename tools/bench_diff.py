#!/usr/bin/env python3
"""Cross-round per-query bench comparison.

Usage:  python3 tools/bench_diff.py <old_bench_queries.json> <new_bench_queries.json> [threshold]

Reads two per-query artifacts written by graft.Bench (SPARK_GRAFT_BENCH_OUT)
and prints every query whose warm time changed by more than `threshold`
(ratio, default 1.25), plus totals, queries only present on one side, and
failures. Exit code 1 if any regression exceeds the threshold — usable as
a cheap perf gate between rounds.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    print(f"totals: warm {old['warm_total_sec']:.2f}s -> {new['warm_total_sec']:.2f}s, "
          f"cold {old['cold_total_sec']:.2f}s -> {new['cold_total_sec']:.2f}s "
          f"({old['n_timed']}/{old['n_queries']} -> {new['n_timed']}/{new['n_queries']} timed)")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    for side, art in (("old", old), ("new", new)):
        if art.get("failed"):
            print(f"{side} FAILED queries: {', '.join(art['failed'])}")
    regressions = []
    rows = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name].get("warm"), nq[name].get("warm")
        if a is None or b is None or a <= 0:
            continue
        ratio = b / a
        if ratio >= threshold or ratio <= 1 / threshold:
            rows.append((ratio, name, a, b))
        if ratio >= threshold:
            regressions.append(name)
    for ratio, name, a, b in sorted(rows, reverse=True):
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"  {name}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x {tag})")
    if regressions:
        print(f"REGRESSIONS past {threshold}x: {', '.join(regressions)}")
        sys.exit(1)
    print("no regressions past threshold")


if __name__ == "__main__":
    main()
