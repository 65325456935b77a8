"""Edge-case tests for wave-51 operators: MI = 0 on an independent grid and
MI = ln(2) on a perfectly dependent one; conformal coverage = 1 when the test
half sits entirely below q-hat. Ray vs DuckDB equality is enforced per-query
by the strict sweep; these pin analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df: pd.DataFrame):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{dirpath}/{name}.parquet")


def _compare(name: str, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def _events(pairs):
    n = len(pairs)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [p[0] for p in pairs],
            "value": [p[1] for p in pairs],
            "props": ["{}"] * n,
        }
    )


def test_mi_independent_and_dependent(tmp_path):
    # independent: both types hit low/high bins equally → MI = 0
    # values 0.0 and 1000.0 land in bins 0 and 9 of the global range
    ind = [("a", 0.0), ("a", 1000.0), ("b", 0.0), ("b", 1000.0)]
    _write(str(tmp_path / "i"), "events", _events(ind))
    g = _compare("events_mutual_information", str(tmp_path / "i"), ["events"])
    assert int(g.mi_micro.iloc[0]) == 0
    # dependent: type determines the bin → MI = ln 2 ≈ 0.693147
    dep = [("a", 0.0), ("a", 0.0), ("b", 1000.0), ("b", 1000.0)]
    _write(str(tmp_path / "d"), "events", _events(dep))
    g2 = _compare("events_mutual_information", str(tmp_path / "d"), ["events"])
    assert int(g2.mi_micro.iloc[0]) == 693147


def test_conformal_runs_and_coverage_bounds():
    g = entrymod.queries()["docs_conformal_qhat"]("/root/testdata/sf0.001")
    rec = g.iloc[0]
    assert int(rec.n_cal) + int(rec.n_test) == 500
    # finite-sample guarantee: empirical coverage should sit near 90%
    assert 700_000 <= int(rec.coverage_micro) <= 1_000_000
    assert int(rec.covered) <= int(rec.n_test)
