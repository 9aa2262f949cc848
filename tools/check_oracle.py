#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares schema + values (rows sorted by all columns, exact equality).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir()
                       if p.is_dir()):
        got = pd.read_parquet(Path(out_dir, name))
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            n_skip += 1
            if len(got) == 0:
                print(f"    WARN: zero rows")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  ✗ {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  ✗ {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(g.columns):
            gv, ev = g[c].tolist(), e[c].tolist()
            for ri in range(len(gv)):
                a, b = gv[ri], ev[ri]
                if isinstance(a, (list, tuple)) or str(type(a)).find('ndarray') >= 0:
                    a = list(a)
                if isinstance(b, (list, tuple)) or str(type(b)).find('ndarray') >= 0:
                    b = list(b)
                if isinstance(a, list) and isinstance(b, list):
                    ok = len(a) == len(b) and all(
                        cells_equal(x, y) for x, y in zip(a, b))
                else:
                    ok = cells_equal(a, b)
                if not ok:
                    bad = (c, ri, a, b)
                    break
            if bad:
                break
        if bad:
            c, ri, a, b = bad
            print(f"  ✗ {name}: first diff col={c} row={ri}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
