#!/usr/bin/env python3
"""Merge a partial ScaleProbe artifact into probe.json.

A filtered probe run (runMain graft.ScaleProbe <label substrings...>)
times only the matching entries; this merges its timings into the main
artifact instead of clobbering the 70+ entries a full run carries.
Label timings take the NEW value (the partial run is the fresher
measurement); sentinel/passes metadata from the partial run is recorded
under "partial_runs" so artifact health stays auditable.

Usage: merge_probe.py <partial.json> <main.json>
"""
import json, sys

partial, main = sys.argv[1], sys.argv[2]
p = json.load(open(partial))
m = json.load(open(main))
for k, v in p["timings_sec"].items():
    m["timings_sec"][k] = v
if "samples_sec" in p and "samples_sec" in m:
    for k, v in p["samples_sec"].items():
        m["samples_sec"][k] = v
runs = m.setdefault("partial_runs", [])
runs.append({
    "labels": sorted(p["timings_sec"].keys()),
    "rows": p.get("rows"), "cpus": p.get("cpus"),
    "passes": p.get("passes"), "sentinel_sec": p.get("sentinel_sec"),
})
json.dump(m, open(main, "w"))
print(f"merged {len(p['timings_sec'])} entries into {main}")
