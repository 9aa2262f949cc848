#!/usr/bin/env python3
"""Reseed tools/bench_ref.json from a full local bench record.

Usage: python3 tools/reseed_bench_ref.py [bench_json] [out_json]

Reads the one-line JSON record graft.Bench writes (default
target/bench.json), extracts the per-query MEDIANS, and writes the flat
{"name": seconds} map the outlier protocol loads. Refuses records that
look partial (fewer queries than the current ref) unless --force, so a
filtered SPARK_GRAFT_BENCH_ONLY run can't silently shrink the
reference.
"""
import json
import sys
from pathlib import Path

src = Path(sys.argv[1] if len(sys.argv) > 1 else "target/bench.json")
out = Path(sys.argv[2] if len(sys.argv) > 2 else "tools/bench_ref.json")
force = "--force" in sys.argv

rec = json.loads(src.read_text())
queries = rec["queries"]
if out.exists() and not force:
    old = json.loads(out.read_text())
    if len(queries) < len(old):
        sys.exit(f"refusing: new record has {len(queries)} queries, "
                 f"ref has {len(old)} (pass --force for a partial reseed)")
out.write_text("{\n" + ",\n".join(
    f'"{k}": {round(v, 3)}' for k, v in sorted(queries.items()))
    + "\n}\n")
print(f"wrote {out} with {len(queries)} queries "
      f"(total {sum(queries.values()):.1f}s, sf={rec.get('sf')}, "
      f"reps={rec.get('reps')})")
