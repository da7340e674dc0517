#!/usr/bin/env python3
"""Refresh tools/bench_baseline.json from a clean bench_summary.json.

The baseline holds per-query seconds from the last CLEAN run (rc=0,
error_count=0); Bench's regression gate flags any query >2x its
baseline AND >0.25s absolute over it. Run this only after inspecting
the run — refreshing from a contended run locks bad numbers in.

Usage: python3 tools/refresh_baseline.py [--min]
  --min   keep, per query, min(old baseline, new run) instead of the
          new run wholesale (best-known-steady-state semantics).
"""
import json, sys, pathlib

root = pathlib.Path(__file__).resolve().parent.parent
summary = json.loads((root / "bench_summary.json").read_text())
if summary.get("error_count", 1) != 0:
    sys.exit(f"refusing: bench_summary has error_count="
             f"{summary.get('error_count')}")
new = dict(summary["queries"])
out = root / "tools" / "bench_baseline.json"
if "--min" in sys.argv and out.exists():
    old = json.loads(out.read_text())
    for k, v in old.items():
        if k in new:
            new[k] = min(new[k], v)
        else:
            new[k] = v  # keep entries for queries absent from this run
body = "{\n" + ",\n".join(f' "{k}": {v}' for k, v in new.items()) + "\n}\n"
out.write_text(body)
print(f"wrote {out} with {len(new)} entries")
