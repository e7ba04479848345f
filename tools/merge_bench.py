#!/usr/bin/env python3
"""Merge N identical-protocol bench JSONs into one min-per-query
artifact (the committed bench.json convention), recomputing the
vs_prev drift block against a previous round's artifact with the same
robust model Bench.scala uses (median log-ratio band, MAD sigma,
flag = |z| > 3 AND > 0.3 s absolute).

Usage: merge_bench.py <prev_bench.json> <out.json> <run1.json> [run2...]
(Driver-side tooling only — the Scala library has no dependency on this.)
"""
import sys, json, math, statistics

prev_path, out_path, *run_paths = sys.argv[1:]
runs = [json.load(open(p)) for p in run_paths]
base = runs[0]
# All merged runs MUST cover the identical query set: a mismatch means
# the runs were not the same protocol, and silently min-ing over a
# partial subset would fabricate a plausible-looking artifact.
base_keys = set(base["queries"])
for p, r in zip(run_paths, runs):
    if set(r["queries"]) != base_keys:
        diff = set(r["queries"]) ^ base_keys
        sys.exit(f"merge_bench: query-set mismatch in {p} vs {run_paths[0]} "
                 f"(symmetric difference: {sorted(diff)[:10]}"
                 f"{'...' if len(diff) > 10 else ''})")
queries = {}
for k in base["queries"]:
    queries[k] = min(r["queries"][k] for r in runs)
total = sum(queries.values())

prev = json.load(open(prev_path))
vs_prev = None
common = [(k, prev["queries"][k], queries[k])
          for k in queries
          if k in prev.get("queries", {}) and prev["queries"][k] > 0]
if len(common) >= 8 and prev.get("sf") == base.get("sf"):
    logs = [math.log(c / p) for _, p, c in common]
    m = statistics.median(logs)
    sigma = max(1.4826 * statistics.median([abs(x - m) for x in logs]), 0.04)
    flagged = {k: {"prev": round(p, 3), "cur": round(c, 3),
                   "z": round((math.log(c / p) - m) / sigma, 1)}
               for (k, p, c), lr in zip(common, logs)
               if abs((lr - m) / sigma) > 3.0 and (c - p) > 0.3}
    vs_prev = {"prev_total": round(sum(p for _, p, _ in common), 1),
               "common": len(common),
               "median_ratio": round(math.exp(m), 4),
               "sigma_log": round(sigma, 4),
               "prev_merged_runs": prev.get("merged_min_of_protocol_runs", 1),
               "flagged": flagged}

out = {"metric": "total", "value": total, "unit": "sec",
       "queries": queries, "sf": base.get("sf"),
       "runs": base.get("runs"), "agg": "min",
       "extra_runs_gt2s": base.get("extra_runs_gt2s"),
       "protocol": base.get("protocol"),
       "merged_min_of_protocol_runs": len(runs),
       "run_totals": [round(r["value"], 1) for r in runs],
       "vs_prev": vs_prev}
json.dump(out, open(out_path, "w"))
n = len(queries)
print(f"merged {len(runs)} runs -> {total:.1f} s / {n} q = {total/n:.3f} s/q")
if vs_prev:
    print("vs_prev:", json.dumps(vs_prev))
