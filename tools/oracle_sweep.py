"""Exact oracle sweep: run every SQL-checked query through Ray AND DuckDB
and compare EXACTLY (bit-identical floats, matching dtypes) — stricter
than tests/test_queries.py's rtol gate and equivalent to the driver's
stringified value-hash compare.

Usage:
    python tools/oracle_sweep.py [sf_dir] [query ...]
    python tools/oracle_sweep.py [sf_dir] --sample N --seed S [--exclude-stamped]

Defaults: sf_dir=/root/testdata/sf0.01, all SQL-checked queries.
`--sample` draws a seeded random subset of the twins — the same
spot-audit protocol the external judges run; `--exclude-stamped` limits
the pool to twins never green in any CORRECTNESS_r*.json (the rows no
driver has ever certified), so the sample measures exactly the
registry's unaudited surface. Owns its Ray session (script entry
point, not library code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
            df[c] = df[c].map(lambda v: tuple(v)
                              if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("Int64", "Int32", "Int16", "UInt32"):
            df[c] = df[c].astype("float64") if df[c].isna().any() \
                else df[c].astype("int64")
        if df[c].dtype in (np.int32, np.uint32, np.int16):
            df[c] = df[c].astype("int64")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def exact_equal(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """[] when equal; else human-readable differences. Floats must be
    BIT-identical (driver hashes stringified values)."""
    errs = []
    if len(a) == 0 and len(b) == 0:
        # Ray's to_pandas drops columns on an empty dataset; an empty
        # result equals an empty result regardless of surviving schema
        return []
    if list(a.columns) != list(b.columns):
        return [f"columns {list(a.columns)} != {list(b.columns)}"]
    if len(a) != len(b):
        return [f"rows {len(a)} != {len(b)}"]
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            errs.append(f"{c}: dtype {a[c].dtype} != {b[c].dtype}")
            continue
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == np.float64:
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        elif str(a[c].dtype).startswith("datetime64"):
            neq = ~((av == bv) | (np.isnat(av) & np.isnat(bv)))
        else:
            neq = np.array([x != y for x, y in zip(av, bv)])
        if neq.any():
            i = int(np.argmax(neq))
            errs.append(f"{c}: {int(neq.sum())} diffs, first@{i}: "
                        f"{av[i]!r} != {bv[i]!r}")
    return errs


def main() -> int:
    argv = sys.argv[1:]
    # sf_dir is optional even when flags are given: a leading --flag
    # means "default sf_dir" rather than a directory named like a flag
    if argv and not argv[0].startswith("--"):
        sf, argv = argv[0], argv[1:]
    else:
        sf = "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import thor_ray.queries as Q
    args = argv
    if "--sample" in args:
        import glob
        import json
        import random
        n_sample = int(args[args.index("--sample") + 1])
        seed = int(args[args.index("--seed") + 1]) \
            if "--seed" in args else 0
        pool = sorted(n for n, (_, s) in Q.QUERIES.items()
                      if s is not None)
        if "--exclude-stamped" in args:
            stamped = set()
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            for f in sorted(glob.glob(os.path.join(repo,
                                                   "CORRECTNESS_r*.json"))):
                d = json.load(open(f))
                stamped |= {k for k, v in d.items()
                            if isinstance(v, dict) and v.get("hash_match")}
            pool = [n for n in pool if n not in stamped]
        names = sorted(random.Random(seed).sample(
            pool, min(n_sample, len(pool))))
        print(f"seeded sample: {len(names)} of {len(pool)} "
              f"(seed={seed})")
    else:
        names = args or sorted(
            n for n, (_, s) in Q.QUERIES.items() if s is not None)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    n_pass = n_fail = 0
    for name in names:
        fn, sql = Q.QUERIES[name]
        if sql is None:
            print(f"  {name}: SKIP (rows-only)")
            continue
        try:
            got = fn(sf)
            got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
            got = normalize(got)
            exp = normalize(con.execute(sql).fetchdf())
            errs = exact_equal(got, exp)
        except Exception as e:  # noqa: BLE001 - report and continue
            errs = [f"EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            n_fail += 1
            print(f"  {name}: FAIL  " + " | ".join(errs[:3]))
        else:
            n_pass += 1
    print(f"sweep: {n_pass} pass, {n_fail} fail "
          f"({len([x for x in names])} requested) @ {sf}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
