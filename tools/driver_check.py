"""Local replica of the driver's correctness gate: run every ``queries()``
entry at a scale factor and compare against ``oracle_sql()`` via DuckDB
(row count + schema + order-insensitive values).

Usage: python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"row count {len(got)} vs oracle {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    g = canon(got)
    w = canon(want)
    if len(g) != len(w):
        return problems
    for c in g.columns:
        gv, wv = g[c].values, w[c].values
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
            gv = pd.to_numeric(g[c], errors="coerce").values.astype(float)
            wv = pd.to_numeric(w[c], errors="coerce").values.astype(float)
            both_nan = np.isnan(gv) & np.isnan(wv)
            exact = (gv == wv) | both_nan
            if not exact.all():
                close = np.isclose(gv, wv, rtol=0, atol=1e-9) | both_nan
                i = int(np.nonzero(~exact)[0][0])
                tagl = "EXACT-DIFF(close)" if close.all() else "VALUE-DIFF"
                problems.append(f"{tagl} col {c} first at {i}: {gv[i]!r} vs {wv[i]!r}")
        else:
            if not (gv == wv).all():
                i = int(np.nonzero(gv != wv)[0][0])
                problems.append(f"VALUE-DIFF col {c} first at {i}: {gv[i]!r} vs {wv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ray_t = time.time() - t0
        if name not in oracles:
            print(f"okNA {name}: rows={len(got)} ({ray_t:.1f}s) [no oracle — rows-only]")
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, got, want)
        status = "ok  " if not problems else "FAIL"
        if problems:
            failures += 1
        print(
            f"{status} {name}: rows={len(got)}/{len(want)} ray={ray_t:.1f}s "
            f"sql={time.time() - t0:.1f}s {'; '.join(problems)}"
        )
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
