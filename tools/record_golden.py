#!/usr/bin/env python3
"""Record benchmaps/golden_counters_sf01.json from a bench run's JSON.

Usage: python3 tools/record_golden.py [target/bench.json]

Copies the run's per-query `counters` map verbatim — updating the golden
is how a counter cost is DECLARED (see benchmaps/README_golden_counters.md).
"""
import json, sys

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
d = json.load(open(src))
assert "sf0.1" in d.get("sf", ""), f"golden must come from an sf0.1 run, got sf={d.get('sf')}"
counters = d["counters"]
out = "benchmaps/golden_counters_sf01.json"
with open(out, "w") as f:
    json.dump({q: counters[q] for q in sorted(counters)}, f, indent=1, sort_keys=True)
print(f"wrote {out}: {len(counters)} queries")
