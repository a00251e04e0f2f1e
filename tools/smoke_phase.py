#!/usr/bin/env python3
"""Run one scale_smoke measurement phase and save it to a partial file,
so each phase fits a bounded shell invocation; tools/smoke_merge.py
assembles the partials into scale_smoke.py's cache format.

Usage: python3 tools/smoke_phase.py {b01|b1|r01|r1}
"""
import json
import sys

sys.path.insert(0, "tools")
import scale_smoke as ss

phase = sys.argv[1]
if phase == "b01":
    out = {"b01": ss.run_bench(ss.SF01)}
elif phase == "b1":
    out = {"b1": ss.run_bench(ss.SF1)}
elif phase == "r01":
    rows, works = ss.run_verify(ss.SF01, "/tmp/scale_smoke_sf01")
    out = {"r01": rows, "dw01": works}
elif phase == "r1":
    rows, works = ss.run_verify(ss.SF1, "/tmp/scale_smoke_sf1")
    out = {"r1": rows, "dw1": works}
else:
    sys.exit(f"unknown phase {phase}")
with open(f"/tmp/smoke_phase_{phase}.json", "w") as f:
    json.dump(out, f)
print(f"phase {phase} done")
