"""Edge-case tests for wave-42 operators: Merkle range localization (a
one-row edit flips exactly one range checksum and the root) and CUSUM on an
obvious mean shift (t* lands at the shift boundary). Tiny adversarial tables
run through BOTH the Ray query and its DuckDB oracle."""

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


def _compare(name: str, sf_dir: str) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def _events(values, ids=None):
    n = len(values)
    ids = ids if ids is not None else np.arange(1, n + 1)
    return pd.DataFrame(
        {
            "event_id": np.array(ids, np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "user_id": np.ones(n, np.int64),
            "event_type": ["view"] * n,
            "value": values,
            "props": ["{}"] * n,
        }
    ).assign(ts=lambda d: d.ts.astype("datetime64[us]"))


def test_merkle_one_row_edit_localizes(tmp_path):
    base = _events([float(i) for i in range(1, 33)])  # ids 1..32 → 2 per range
    _write(str(tmp_path / "a"), "events", base)
    edited = base.copy()
    edited.loc[edited.event_id == 5, "value"] = 999.0  # range of id 5 only
    _write(str(tmp_path / "b"), "events", edited)
    ga = _compare("events_merkle_ranges", str(tmp_path / "a"))
    gb = _compare("events_merkle_ranges", str(tmp_path / "b"))
    ma = dict(zip(ga.range_id.astype(int), ga.checksum.astype(int)))
    mb = dict(zip(gb.range_id.astype(int), gb.checksum.astype(int)))
    diff = [r for r in ma if r >= 0 and ma[r] != mb[r]]
    assert len(diff) == 1  # exactly one range diverges
    assert ma[-1] != mb[-1]  # and the root detects it


def test_cusum_finds_mean_shift():
    # 10 low values then 10 high: |S_t| peaks exactly at the boundary t=10
    import ray.data  # noqa: F401

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = _events([10.0] * 10 + [50.0] * 10)
        _write(td, "events", df)
        g = _compare("events_cusum_changepoint", td)
        rec = g.iloc[0]
        assert int(rec.t_star) == 10
        # S_10 = 20·(10·1000) − 10·(20·3000)·... verified by the oracle; just
        # check the magnitude is the analytic value: n=20, total=60000 cents,
        # S_10 = sum(20·1000 − 60000) over 10 = 10·(20000−60000) = −400000
        assert int(rec.s_abs) == 400000
