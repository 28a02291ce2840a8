#!/usr/bin/env python3
"""Scale audit over a graft.Explain plan dump.

Reads every <dumpdir>/<query>.txt written by `runMain graft.Explain`
and reports the suite-wide plan-shape counters the per-round audit
tracks: cartesian products (fail), broadcast vs sort-merge joins,
bounded nested-loop joins, scans with pushed filters, plan errors.

Exit code 1 if any plan contains a CartesianProduct or an ERROR —
the two states that must never ship.

Usage: python3 tools/plan_audit.py /tmp/graft_plans
Dev-only tool (driver-side python env), not part of the shipped
library.
"""
import sys, os, re, collections

dumpdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_plans"
counters = collections.Counter()
offenders = {"cartesian": [], "error": []}
per_query_smj = []

for fn in sorted(os.listdir(dumpdir)):
    if not fn.endswith(".txt"):
        continue
    q = fn[:-4]
    text = open(os.path.join(dumpdir, fn)).read()
    counters["plans"] += 1
    if text.startswith("ERROR"):
        counters["errors"] += 1
        offenders["error"].append(q)
        continue
    c = len(re.findall(r"CartesianProduct", text))
    if c:
        counters["cartesian"] += c
        offenders["cartesian"].append(q)
    bhj = len(re.findall(r"\bBroadcastHashJoin\b", text))
    smj = len(re.findall(r"\bSortMergeJoin\b", text))
    bnl = len(re.findall(r"\bBroadcastNestedLoopJoin\b", text))
    counters["broadcast_hash_join"] += bhj
    counters["sort_merge_join"] += smj
    counters["broadcast_nested_loop"] += bnl
    if smj:
        per_query_smj.append((q, smj))
    if re.search(r"PushedFilters: \[[^\]]", text):
        counters["plans_with_pushed_filters"] += 1
    # count shuffle, broadcast and reused exchanges alike (\bExchange\b
    # alone would miss BroadcastExchange/ReusedExchange — no word
    # boundary inside the identifier)
    counters["exchanges"] += len(
        re.findall(r"\b(?:Broadcast|Reused)?Exchange\b", text))

print("plans:", counters["plans"], " errors:", counters["errors"])
print("cartesian products:", counters["cartesian"])
print("BroadcastHashJoin:", counters["broadcast_hash_join"],
      " SortMergeJoin:", counters["sort_merge_join"],
      " BroadcastNestedLoop:", counters["broadcast_nested_loop"])
print("plans with PushedFilters:", counters["plans_with_pushed_filters"])
print("total Exchange operators:", counters["exchanges"])
if per_query_smj:
    print("SMJ queries (big-big joins, audit these):",
          ", ".join(f"{q}({n})" for q, n in per_query_smj))
for kind, qs in offenders.items():
    if qs:
        print(f"{kind.upper()}: {', '.join(qs)}")
sys.exit(1 if offenders["cartesian"] or offenders["error"] else 0)
