#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare — STRICT.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameFilter...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares the way the driver does:
  * columns sorted BY NAME (both sides) — names must match exactly;
  * rows sorted canonically by all columns on BOTH sides (empirically the
    driver hashes a row-sorted frame: q57-class queries whose only
    divergence is NULLS FIRST (Spark) vs NULLS LAST (DuckDB) tie order
    are driver-GREEN, so in-frame order must not matter);
  * dtype-strict: an int64 Spark column vs a float64 DuckDB column fails
    even when every value is numerically equal (this is exactly the DuckDB
    HUGEINT → float64 class that shipped q71/q128/q129 red on the driver
    while the old value-coercing local check stayed green);
  * value-strict: no int==float coercion; NaN equals NaN but NaN is NOT
    None/NULL in object columns.
Datetime columns are normalized to [us] resolution on both sides before the
dtype check (pyarrow reads ns, DuckDB returns us — the driver's hasher sees
equal epoch values, so resolution alone must not fail locally).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_dtypes(df: pd.DataFrame) -> pd.DataFrame:
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def cells_equal_strict(a, b) -> bool:
    """Type-strict scalar equality: no int/float coercion, NaN==NaN only
    when both sides are floats, None==None only when both are None."""
    if a is None or b is None:
        return a is None and b is None
    a_float = isinstance(a, (float, np.floating))
    b_float = isinstance(b, (float, np.floating))
    a_int = isinstance(a, (int, np.integer)) and not isinstance(a, bool)
    b_int = isinstance(b, (int, np.integer)) and not isinstance(b, bool)
    if a_float or b_float:
        if not (a_float and b_float):
            return False  # int vs float = driver hash flip
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return float(a) == float(b)
    if a_int or b_int:
        return a_int and b_int and int(a) == int(b)
    # pandas NaT / NA in object context
    try:
        if pd.isna(a) or pd.isna(b):
            return bool(pd.isna(a)) and bool(pd.isna(b)) and \
                type(a).__name__ == type(b).__name__
    except (TypeError, ValueError):
        pass
    return a == b


def as_list(x):
    if isinstance(x, (list, tuple)):
        return list(x)
    if isinstance(x, np.ndarray):
        return x.tolist()
    return None


def canon_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Row-sort by all columns; falls back to a repr key for unorderable
    object cells (lists/arrays). Applied identically to both sides, so
    equal frames align and unequal frames still diff."""
    if len(df) == 0 or len(df.columns) == 0:
        return df
    try:
        return df.sort_values(by=list(df.columns), ignore_index=True)
    except TypeError:
        return df.sort_values(by=list(df.columns), ignore_index=True,
                              key=lambda s: s.map(repr))


def compare_one(name, got, exp):
    got = canon_rows(norm_dtypes(got.reindex(sorted(got.columns), axis=1)))
    exp = canon_rows(norm_dtypes(exp.reindex(sorted(exp.columns), axis=1)))
    if list(got.columns) != list(exp.columns):
        return f"columns {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        gd, ed = str(got[c].dtype), str(exp[c].dtype)
        if gd != ed and not (gd == "object" and ed == "object"):
            # object-vs-typed is also a mismatch unless values prove equal
            # types; simplest driver-faithful rule: dtypes must agree.
            return f"dtype col={c}: spark={gd} duckdb={ed}"
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for ri in range(len(gv)):
            a, b = gv[ri], ev[ri]
            la, lb = as_list(a), as_list(b)
            if la is not None or lb is not None:
                ok = (la is not None and lb is not None
                      and len(la) == len(lb)
                      and all(cells_equal_strict(x, y)
                              for x, y in zip(la, lb)))
            else:
                ok = cells_equal_strict(a, b)
            if not ok:
                return (f"first diff col={c} row={ri}: spark={a!r} "
                        f"({type(a).__name__}) duckdb={b!r} "
                        f"({type(b).__name__})")
    return None


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    filters = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; Spark-written dirs (e.g.
        # SeedPerturb's) hold part files under <t>.parquet/
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir()
                       if p.is_dir()):
        if filters and not any(f in name for f in filters):
            continue
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
        err = compare_one(name, got, exp)
        if err:
            print(f"  ✗ {name}: {err}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
