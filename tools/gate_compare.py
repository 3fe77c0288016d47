#!/usr/bin/env python3
"""Round-over-round gate comparison: the working-tree BENCH_MEDIANS.json
vs a committed gate (git show <ref>:BENCH_MEDIANS.json). Prints common
-subset median ratio, flags >1.5x and >2x rows, and applies the
contention read rule (BASELINE.md "Reading BENCH_MEDIANS"): a flagged
row whose min-of-runs is at-or-below the gate median is noise."""
import json, subprocess, sys

ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
new = json.load(open("BENCH_MEDIANS.json"))
old = json.loads(subprocess.check_output(
    ["git", "show", f"{ref}:BENCH_MEDIANS.json"]).decode())

def rows(doc):
    out = {}
    for k, v in doc["queries"].items():
        if isinstance(v, dict):
            if v.get("median") == "err":
                continue
            out[k] = (float(v["median"]),
                      float(v.get("min", v["median"])))
        elif v != "err":
            out[k] = (float(v), float(v))
    return out

n, o = rows(new), rows(old)
common = sorted(set(n) & set(o))
ratios = sorted(n[q][0] / o[q][0] for q in common)
med = ratios[len(ratios) // 2]
tot_n = sum(n[q][0] for q in common)
tot_o = sum(o[q][0] for q in common)
print(f"common subset: {len(common)} queries")
print(f"median per-query ratio: {med:.3f}x; totals {tot_n:.1f}s vs "
      f"{tot_o:.1f}s ({tot_n / tot_o:.3f}x)")
flags = [(q, n[q][0] / o[q][0]) for q in common if n[q][0] / o[q][0] > 1.5]
print(f">1.5x rows: {len(flags)}; >2x rows: "
      f"{sum(1 for _, r in flags if r > 2)}")
for q, r in sorted(flags, key=lambda t: -t[1]):
    noise = n[q][1] <= o[q][0] * 1.1
    print(f"  {q}: {r:.2f}x (new {n[q][0]:.2f}s min {n[q][1]:.2f}s "
          f"vs gate {o[q][0]:.2f}s){' [min at gate => contended]' if noise else ''}")
new_qs = sorted(set(n) - set(o))
print(f"new rows ({len(new_qs)}):")
for q in new_qs:
    print(f"  {q}: {n[q][0]:.2f}s")
