#!/usr/bin/env python3
"""Merge N identical-protocol Bench runs into one per-row-min bench.json.

Usage: merge_bench.py out.json run1.json run2.json [...]

The per-row min across identical-protocol runs is the suite's committed
bench convention (host noise is strictly additive, so min is the least
biased estimator available without a dedicated quiet host); the merged
file records how many protocol runs fed it.
"""
import json
import sys


def main() -> None:
    out, *runs = sys.argv[1:]
    datas = [json.load(open(p)) for p in runs]
    base = dict(datas[0])
    names = set(datas[0]["queries"])
    for d in datas[1:]:
        assert set(d["queries"]) == names, "protocol mismatch: query sets differ"
    merged = {q: min(d["queries"][q] for d in datas) for q in datas[0]["queries"]}
    base["queries"] = merged
    base["value"] = sum(merged.values())
    base["merged_min_of_protocol_runs"] = len(datas)
    base["protocol_run_totals"] = [round(sum(d["queries"].values()), 3) for d in datas]
    json.dump(base, open(out, "w"))
    print(f"{out}: {base['value']:.1f} s over {len(merged)} queries "
          f"({base['value'] / len(merged):.4f} s/q) from {len(datas)} runs "
          f"{base['protocol_run_totals']}")


if __name__ == "__main__":
    main()
