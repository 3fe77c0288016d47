#!/usr/bin/env python3
"""Regenerate BASELINE.md's CURRENT GATE table from BENCH_MEDIANS.json.

Usage: python3 tools/promote_gate.py [--medians BENCH_MEDIANS.json]
                                     [--prev /tmp/medians_r10.json]

Prints the markdown table plus round-over-round stats (median per-query
ratio on the common subset, entries > 1.5x / > 2x) to stdout; the
narrative paragraphs are edited by hand.
"""
import argparse
import json
import statistics


def medians(path):
    d = json.load(open(path))
    return {k: v["median"] for k, v in d["queries"].items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--medians", default="BENCH_MEDIANS.json")
    ap.add_argument("--prev", default=None)
    args = ap.parse_args()

    cur = medians(args.medians)
    print(f"rows: {len(cur)}  total: {sum(cur.values()):.1f} s")
    if args.prev:
        prev = medians(args.prev)
        common = sorted(set(cur) & set(prev))
        ratios = {q: cur[q] / prev[q] for q in common if prev[q] > 0}
        if ratios:  # empty common subset would crash statistics.median
            med = statistics.median(ratios.values())
            over15 = {q: r for q, r in ratios.items() if r > 1.5}
            over20 = {q: r for q, r in ratios.items() if r > 2.0}
            print(f"common subset: {len(common)}  median ratio: {med:.2f}x")
            print(f">1.5x: { {q: round(r, 2) for q, r in sorted(over15.items())} }")
            print(f">2.0x: { {q: round(r, 2) for q, r in sorted(over20.items())} }")
            faster = {q: round(r, 2) for q, r in sorted(ratios.items())
                      if r < 0.67}
            print(f"<0.67x (improvements): {faster}")
        else:
            print(f"common subset: {len(common)} - no ratio stats")
        print("new queries:", sorted(set(cur) - set(prev)))
    print()
    print("| query | median seconds |")
    print("|---|---|")

    def key(name):
        digits = "".join(ch for ch in name.split("_")[0] if ch.isdigit())
        return (int(digits), name) if digits else (0, name)

    for q in sorted(cur, key=key):
        print(f"| {q} | {cur[q]:.2f} |")


if __name__ == "__main__":
    main()
