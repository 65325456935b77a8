"""Edge-case tests for wave-38 operators: interval coverage with nested /
identical / touching intervals and a cross-user leak probe (a user whose
intervals all sit INSIDE an earlier user's huge interval must still count its
own coverage); lift where one pair dominates (lift > 1) and an independent
pair. Tiny adversarial tables run through BOTH the Ray query and its DuckDB
oracle."""

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


def test_interval_coverage_shapes(tmp_path):
    # value cents → duration: 1 cent = 10 ms. user 1 (huge interval first,
    # then nested + touching); user 33 (same bucket mod 32) starts INSIDE
    # user 1's span — per-user cummax must not leak across users.
    base = pd.Timestamp("2024-01-01 00:00:00")

    def ev(eid, uid, offset_s, value):
        return (eid, base + pd.Timedelta(seconds=offset_s), uid, value)

    rows = [
        ev(1, 1, 0, 1000.0),  # [0s, 1000s): the umbrella
        ev(2, 1, 10, 5.0),  # nested: adds nothing
        ev(3, 1, 1000, 10.0),  # touching: adds exactly 10s
        ev(4, 33, 5, 10.0),  # user 33: [5, 15) — must count 10s
        ev(5, 33, 15, 10.0),  # touching: +10s
        ev(6, 33, 12, 1.0),  # nested inside [5,15): +0
    ]
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": ["view"] * len(rows),
            "value": [r[3] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_interval_coverage", str(tmp_path), ["events"])
    cov = dict(zip(g.user_id.astype(int), g.covered_us.astype(int)))
    assert cov[1] == 1010 * 1_000_000
    assert cov[33] == 20 * 1_000_000


def test_lift_dominant_pair(tmp_path):
    # 4 baskets, N=4: (1,2) co-occur in 2, each appears in 2 → lift = 2.0;
    # (3,4) co-occur in all 4, each appears in 4 → lift = 1.0 (independent);
    # (1,3): n_ab=2, n_1=2, n_3=4 → lift = 1.0.
    rows = []
    lineno = 1
    baskets = {1: [1, 2, 3, 4], 2: [1, 2, 3, 4], 3: [3, 4], 4: [3, 4]}
    for o, parts in baskets.items():
        for p in parts:
            rows.append((o, p, lineno))
            lineno += 1
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.array([r[1] for r in rows], np.int64),
            "l_suppkey": np.ones(len(rows), np.int64),
            "l_linenumber": np.array([r[2] for r in rows], np.int32),
            "l_quantity": np.ones(len(rows)),
            "l_extendedprice": np.full(len(rows), 100.0),
            "l_discount": np.zeros(len(rows)),
            "l_tax": np.zeros(len(rows)),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pd.to_datetime(["1996-01-01"] * len(rows)).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare("basket_pair_lift", str(tmp_path), ["lineitem"])
    m = {(int(r.part_a), int(r.part_b)): int(r.lift_micro) for r in g.itertuples()}
    assert m[(1, 2)] == 2_000_000
    assert m[(3, 4)] == 1_000_000
    assert m[(1, 3)] == 1_000_000
