"""Edge-case tests for wave-70 operators: anisotropy closed forms (identical
vectors -> 1.0; a perfectly balanced ± pair -> 0) and stickiness on a
hand-built month (every user active every day -> 10000 bp; a month-boundary
user counted in both months' MAU). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values on tiny adversarial
tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, obj):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = (
        pa.Table.from_pandas(obj, preserve_index=False)
        if isinstance(obj, pd.DataFrame)
        else obj
    )
    pq.write_table(t.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


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


def _emb(vecs):
    return pa.table(
        {
            "vec_id": pa.array(np.arange(1, len(vecs) + 1, dtype=np.int64)),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(vecs), np.int32)),
        }
    )


def test_anisotropy_closed_forms(tmp_path):
    dim = 64
    v = np.zeros(dim); v[0] = 1.0
    # four identical vectors: ||sum||^2 = 16*q^2; n*SS = 4*4*q^2 -> 1.0
    _write(str(tmp_path / "same"), "embeddings", _emb([v, v, v, v]))
    g = _compare("emb_anisotropy", str(tmp_path / "same"), ["embeddings"]).iloc[0]
    assert int(g.anisotropy_micro) == 1_000_000
    # balanced ± pair: sum = 0 -> 0
    _write(str(tmp_path / "bal"), "embeddings", _emb([v, -v]))
    g2 = _compare("emb_anisotropy", str(tmp_path / "bal"), ["embeddings"]).iloc[0]
    assert int(g2.anisotropy_micro) == 0
    assert int(g2.n) == 2


def test_stickiness_hand_built(tmp_path):
    rows = []
    # January: users 1 and 2 active on BOTH Jan 30 and Jan 31 ->
    # MAU=2, DAU=2 each day, stickiness = 10000 bp
    for d in ("2024-01-30", "2024-01-31"):
        for u in (1, 2):
            rows.append((f"{d} 12:00:00", u))
    # user 2 also active Feb 1 (single Feb day): Feb MAU=1, DAU=1 -> 10000
    rows.append(("2024-02-01 09:00:00", 2))
    # user 3 active only Jan 30: Jan MAU becomes 3, sum_dau = 3 + 2
    rows.append(("2024-01-30 08:00:00", 3))
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": ["view"] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_stickiness", str(tmp_path), ["events"]).set_index("month")
    jan = g.loc["2024-01"]
    # Jan: MAU=3, DAUs = [3, 2], n_days=2 -> (5/2)/3 = 0.8333 -> 8333 bp
    assert (int(jan.mau), int(jan.sum_dau), int(jan.n_days)) == (3, 5, 2)
    assert int(jan.stickiness_bp) == 8333
    feb = g.loc["2024-02"]
    assert (int(feb.mau), int(feb.sum_dau), int(feb.n_days)) == (1, 1, 1)
    assert int(feb.stickiness_bp) == 10_000
