#!/usr/bin/env python
"""Local replica of the driver's correctness gate, STRICTER than the driver:
runs every `__ray_entry__.queries()` entry and its `oracle_sql()` through DuckDB
on the same parquet tables and requires EXACT dtype + value equality (the
driver rounds floats to 6 decimals before hashing; this script does not).

    python scripts/sweep_oracles.py [sf_dir] [query ...]   # default sf0.01, all

Prints one line per query and a final summary; exit code 1 on any mismatch.
"""

import os
import sys
import time

import duckdb
import pandas as pd

# `python scripts/sweep_oracles.py` puts scripts/ (not the repo root) on
# sys.path — the driver contract and the package live at the root
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.chdir(_ROOT)  # Ray workers resolve the package via cwd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # dynamic oracles inline per-sf fit constants — bind them to the same sf
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR", log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, osql = em.queries(), em.oracle_sql()
    if len(sys.argv) > 2:  # optional subset of query names
        qs = {k: v for k, v in qs.items() if k in sys.argv[2:]}
    bad, n_ok, n_ro = [], 0, 0
    t_all = time.time()
    for name in sorted(qs):
        t0 = time.time()
        try:
            got = qs[name](sf)
            if isinstance(got, ray.data.Dataset):
                got = got.to_pandas()
            elif not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            if name in osql:
                exp = con.execute(osql[name]).df()
                cols = sorted(got.columns)
                g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
                e = (
                    exp.reindex(sorted(exp.columns), axis=1)
                    .sort_values(sorted(exp.columns))
                    .reset_index(drop=True)
                )
                ok = (
                    list(g.dtypes.astype(str)) == list(e.dtypes.astype(str))
                    and len(g) == len(e)
                    and g.equals(e)
                )
                status = "OK" if ok else "MISMATCH"
                if ok:
                    n_ok += 1
                else:
                    bad.append(name)
            else:
                status = f"rows-only ({len(got)})"
                n_ro += 1
            print(f"{name:28s} {status:18s} {time.time() - t0:6.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:80]}", flush=True)
    print(
        f"TOTAL {round(time.time() - t_all, 1)}s  strict-OK={n_ok} "
        f"rows-only={n_ro} BAD={bad}"
    )
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
