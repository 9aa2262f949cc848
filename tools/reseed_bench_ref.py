#!/usr/bin/env python3
"""Reseed tools/bench_ref.json from a full local bench record.

Usage: python3 tools/reseed_bench_ref.py [bench_json] [out_json]

Reads the one-line JSON record graft.Bench writes (default
target/bench.json), extracts the per-query MEDIANS, and writes the flat
{"name": seconds} map the outlier protocol loads. Refuses (unless --force)
whenever the new record is missing ANY query the current ref covers —
whether from a filtered SPARK_GRAFT_BENCH_ONLY run or from queries that
failed in the bench — so reference bounds never vanish silently.
"""
import json
import sys
from pathlib import Path

# strip flags BEFORE positional parsing: `reseed_bench_ref.py --force`
# must not read Path("--force") as the bench record
force = "--force" in sys.argv[1:]
args = [a for a in sys.argv[1:] if a != "--force"]
src = Path(args[0] if len(args) > 0 else "target/bench.json")
out = Path(args[1] if len(args) > 1 else "tools/bench_ref.json")

rec = json.loads(src.read_text())
queries = rec["queries"]
if out.exists() and not force:
    old = json.loads(out.read_text())
    # compare KEY SETS, not counts: N failed queries + N new queries
    # would otherwise reseed silently and drop the failed queries'
    # reference bounds
    missing = sorted(set(old) - set(queries))
    if missing:
        sys.exit(f"refusing: new record lacks {len(missing)} queries "
                 f"the ref covers ({', '.join(missing[:5])}"
                 f"{'...' if len(missing) > 5 else ''}) — they likely "
                 "FAILED in the bench; pass --force to drop their bounds")
out.write_text("{\n" + ",\n".join(
    f'"{k}": {round(v, 3)}' for k, v in sorted(queries.items()))
    + "\n}\n")
print(f"wrote {out} with {len(queries)} queries "
      f"(total {sum(queries.values()):.1f}s, sf={rec.get('sf')}, "
      f"reps={rec.get('reps')})")
