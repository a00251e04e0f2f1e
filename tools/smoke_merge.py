#!/usr/bin/env python3
"""Merge tools/smoke_phase.py partials into scale_smoke.py's cache file
so the grading pass can run without re-measuring."""
import json

merged = {}
for p in ["b01", "b1", "r01", "r1"]:
    with open(f"/tmp/smoke_phase_{p}.json") as f:
        merged.update(json.load(f))
merged.setdefault("dw01", {})
merged.setdefault("dw1", {})
import sys
sys.path.insert(0, "tools")
import scale_smoke as ss
with open(ss.CACHE, "w") as f:
    json.dump(merged, f)
print(f"wrote {ss.CACHE}")
