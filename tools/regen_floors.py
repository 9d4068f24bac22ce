#!/usr/bin/env python3
"""Regenerate tools/bench_floors.json from two full-detail 1x bench runs:
floor(query) = min of the two samples (the quiet-machine pin Bench.scala's
rerun + final-sweep defenses compare against). Queries present in only one
run (e.g. benchDeferred under a targeted selection) keep that sample.

Usage: python3 tools/regen_floors.py runA.json runB.json [...]
"""
import sys, json

runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
assert runs, "pass at least one bench_full-style json"
floors = {}
for r in runs:
    for q, t in r.items():
        if t is None or t < 0:
            continue
        floors[q] = min(floors.get(q, t), t)
out = {"_doc": "Per-query quiet-machine floor seconds (sf0.1, 1x) = min "
               "across the closing runs; regenerated per round by "
               "tools/regen_floors.py. Bench.scala's in-loop rerun and "
               "post-suite final sweep fire when a recorded time exceeds "
               "2x its floor (and 0.75s absolute).",
       "floors": dict(sorted(floors.items()))}
json.dump(out, open("tools/bench_floors.json", "w"), indent=1)
print(f"wrote tools/bench_floors.json: {len(floors)} floors")
