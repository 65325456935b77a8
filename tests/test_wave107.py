"""Edge-case tests for wave-107 operators: sequence gaps (a gap crossing a
4096-wide bucket border merges into one row; an ENTIRELY absent bucket run
is synthesized from the present-bucket markers; duplicate keys don't create
phantom gaps) and role verbosity (hand-counted chars per role over a tiny
events fixture through the full transcript derivation). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values."""

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


def test_sequence_gaps_borders_and_whole_buckets(tmp_path):
    # keys: 10, 11, 12 | 4093 | 4100 | 20000 (+ duplicate 11)
    # gaps: [13, 4092], [4094, 4099], [4101, 19999] — the last one spans
    # whole absent buckets (1..3 in 4096-wide ranges)
    keys = [10, 11, 11, 12, 4093, 4100, 20000]
    _write(str(tmp_path), "orders", pd.DataFrame(
        {
            "o_orderkey": np.array(keys, np.int64),
            "o_custkey": np.ones(len(keys), np.int64),
            "o_orderstatus": ["F"] * len(keys),
            "o_totalprice": np.zeros(len(keys)),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(keys)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(keys),
        },
    ))
    g = _compare("orders_sequence_gaps", str(tmp_path), ["orders"]).set_index(
        "gap_start"
    )
    assert int(g.loc[13, "gap_end"]) == 4092
    assert int(g.loc[4094, "gap_end"]) == 4099
    assert int(g.loc[4101, "gap_end"]) == 19999
    assert int(g.loc[4101, "n_missing"]) == 19999 - 4101 + 1
    assert len(g) == 3


def test_role_verbosity_hand_counted(tmp_path):
    # one click (role user, DEBUG) and one signup (role system, fallback)
    rows = [
        (1, "2024-01-01 10:00", 5, "click", '{"k": 3}'),
        (2, "2024-01-01 11:00", 5, "signup", '{"k": 44}'),
    ]
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(len(rows)),
            "props": [r[4] for r in rows],
        },
    ))
    g = _compare("transcripts_role_verbosity", str(tmp_path), ["events"]).set_index(
        "role"
    )
    # click text: "[DEBUG] click k=3" → 17 chars
    assert int(g.loc["user", "total_chars"]) == len("[DEBUG] click k=3")
    # signup fallback text: "session start k=44" → 18 chars
    assert int(g.loc["system", "total_chars"]) == len("session start k=44")
    assert int(g.loc["user", "chars_per_turn_micro"]) == 17 * 1_000_000
