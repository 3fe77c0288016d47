#!/usr/bin/env python3
"""Round-over-round gate comparison: the working-tree BENCH_MEDIANS.json
vs a committed gate (git show <ref>:BENCH_MEDIANS.json). Prints common
-subset median ratio, flags >1.5x and >2x rows, and applies the
contention read rule (BASELINE.md "Reading BENCH_MEDIANS"): a flagged
row is CONTENDED only when BOTH documented conditions hold — its
min-of-runs is at-or-below the gate median AND its run spread
(max/min) is large (>= 2)."""
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
                      float(v.get("min", v["median"])),
                      float(v.get("spread", 1.0)))
        elif v != "err":
            out[k] = (float(v), float(v), 1.0)
    return out

n, o = rows(new), rows(old)
common = sorted(set(n) & set(o))
ratios = sorted(n[q][0] / o[q][0] for q in common)
# true median: average the two middle ratios for even-length lists
mid = len(ratios) // 2
med = ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2
tot_n = sum(n[q][0] for q in common)
tot_o = sum(o[q][0] for q in common)
print(f"common subset: {len(common)} queries")
print(f"median per-query ratio: {med:.3f}x; totals {tot_n:.1f}s vs "
      f"{tot_o:.1f}s ({tot_n / tot_o:.3f}x)")
flags = [(q, n[q][0] / o[q][0]) for q in common if n[q][0] / o[q][0] > 1.5]
print(f">1.5x rows: {len(flags)}; >2x rows: "
      f"{sum(1 for _, r in flags if r > 2)}")
for q, r in sorted(flags, key=lambda t: -t[1]):
    # BASELINE.md read rule, both halves: min at-or-below the gate
    # median AND spread >= 2 (a load spike taxed one interleaved pass)
    noise = n[q][1] <= o[q][0] and n[q][2] >= 2.0
    print(f"  {q}: {r:.2f}x (new {n[q][0]:.2f}s min {n[q][1]:.2f}s "
          f"spread {n[q][2]:.2f} vs gate {o[q][0]:.2f}s)"
          f"{' [min at gate + spread>=2 => contended]' if noise else ''}")
new_qs = sorted(set(n) - set(o))
print(f"new rows ({len(new_qs)}):")
for q in new_qs:
    print(f"  {q}: {n[q][0]:.2f}s")
