"""Local mimic of the driver's correctness gate: run every queries()
entry at a given sf dir, run the matching oracle_sql() through DuckDB on
the same parquet files, and compare row count + (sorted-by-name) schema +
order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize list columns to tuples so they sort/hash
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, tuple)) or df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple))
                              else (tuple(v.tolist()) if hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(canon(df), index=False).sum())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    # retired queries stay locally verified even though the driver's
    # 50-row report cap keeps them out of queries()
    from json_to_parquet_ray.queries import (
        RETIRED_ORACLE_SQL, RETIRED_QUERIES,
    )
    qs = {**qs, **RETIRED_QUERIES}
    sqls = {**sqls, **RETIRED_ORACLE_SQL}
    unknown = only - set(qs)
    if unknown:  # a typo'd name must not report '0 failures' over nothing
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:28s} QUERY-ERROR {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"{name:28s} rows={len(mine):>7d}  (rows-only, {dt:.1f}s)")
            continue
        try:
            oracle = con.execute(sqls[name]).df()
        except Exception as ex:
            print(f"{name:28s} ORACLE-ERROR {ex}")
            fails.append(name)
            continue
        ok_rows = len(mine) == len(oracle)
        cols_m = sorted(mine.columns)
        cols_o = sorted(oracle.columns)
        ok_cols = cols_m == cols_o
        ok_hash = False
        if ok_rows and ok_cols:
            try:
                cm, co = canon(mine), canon(oracle)
                # align dtypes where possible
                for c in cm.columns:
                    if cm[c].dtype != co[c].dtype:
                        try:
                            cm[c] = cm[c].astype(co[c].dtype)
                        except (TypeError, ValueError):
                            pass
                # cm/co are already canonicalized — hash directly instead
                # of paying canon()'s sort twice per side
                ok_hash = (int(pd.util.hash_pandas_object(
                    cm, index=False).sum())
                    == int(pd.util.hash_pandas_object(
                        co, index=False).sum()))
                if not ok_hash:
                    diff = (cm != co)
                    print("   first diffs:", [(c, cm[c][diff[c]].head(2).tolist(),
                                               co[c][diff[c]].head(2).tolist())
                                              for c in cm.columns if diff[c].any()][:3])
            except Exception as ex:
                print(f"   hash-cmp error: {ex}")
        status = "OK" if (ok_rows and ok_cols and ok_hash) else \
            f"MISMATCH rows={ok_rows}({len(mine)}/{len(oracle)}) cols={ok_cols} hash={ok_hash}"
        if not (ok_rows and ok_cols and ok_hash):
            if not ok_cols:
                print("   cols mine:", cols_m, " oracle:", cols_o)
            fails.append(name)
        print(f"{name:28s} {status}  ({dt:.1f}s)")
    print(f"\n{len(fails)} failures: {fails}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
