"""Edge-case tests for wave-79 operators: audio VAD (hand-computed burst
cadence for a known class: period/duty arithmetic, run counting, exact micro
ratio; all-silence never occurs by construction but a constant-tone clip is
fully voiced) and Q21 sole-blame (two late suppliers → nobody blamed;
single-supplier order → no blame even if late; the unique late supplier in a
2-supplier order earns it). Ray vs DuckDB equality is enforced per-query by
the strict sweep; these pin analytic values on tiny adversarial tables."""

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


def test_vad_burst_cadence_class0(tmp_path):
    # class k=0: period 3, duty 1 -> frames f with f % 3 == 0 active:
    # 0,3,6,...,24 -> 9 voiced frames, 9 singleton segments, longest 1.
    docs = pd.DataFrame(
        {
            "doc_id": np.array([0, 40, 3], np.int64),  # 0 and 40 same class
            "text": ["a", "b", "c"],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": np.array([1, 1, 1], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("audio_vad", str(tmp_path), ["documents"]).set_index("media_id")
    for mid in (0, 40):
        assert int(g.loc[mid, "n_voiced"]) == 9
        assert int(g.loc[mid, "n_segments"]) == 9
        assert int(g.loc[mid, "longest_segment"]) == 1
        assert int(g.loc[mid, "voiced_ratio_micro"]) == 9 * 1_000_000 // 25
    # class k=3: period 6, duty 4 -> frames (f+3)%6 < 4 -> longest run 4
    assert int(g.loc[3, "longest_segment"]) == 4


def test_vad_actor_constant_tone_fully_voiced():
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        AudioVADActor,
        synthesize_audio_batch,
    )

    rep = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64))})
    out = AudioVADActor()(synthesize_audio_batch(rep)).to_pandas()
    assert (out["n_segments"] == 1).all()
    assert (out["voiced_ratio_micro"] == 1_000_000).all()


def _orders(rows):
    n = len(rows)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.ones(n, np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.ones(n, np.float64),
            "o_orderdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def _lineitem(rows):
    # rows: (l_orderkey, l_suppkey, shipdate)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in rows], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_q21_blame_rules(tmp_path):
    orders = _orders(
        [
            (1, "1996-01-01"),  # supp 1 late, supp 2 on time -> supp 1 blamed
            (2, "1996-01-01"),  # both late -> nobody blamed
            (3, "1996-01-01"),  # single supplier late -> no blame (ns < 2)
            (4, "1996-01-01"),  # supp 1 late again (two items, one late)
        ]
    )
    li = _lineitem(
        [
            (1, 1, "1996-06-01"),  # late
            (1, 2, "1996-01-15"),  # on time
            (2, 1, "1996-06-01"),  # late
            (2, 2, "1996-07-01"),  # late
            (3, 1, "1996-12-01"),  # late but alone
            (4, 1, "1996-01-10"),  # on-time item...
            (4, 1, "1996-09-01"),  # ...but max shipdate late -> supp 1 late
            (4, 3, "1996-01-20"),  # on time
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    supp = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3], np.int64),
            "s_name": [f"Supplier#{k}" for k in (1, 2, 3)],
            "s_nationkey": np.zeros(3, np.int32),
            "s_acctbal": np.zeros(3, np.float64),
        }
    )
    _write(str(tmp_path), "supplier", supp)
    g = _compare(
        "q21_blame", str(tmp_path), ["orders", "lineitem", "supplier"]
    ).set_index("s_suppkey")
    assert set(g.index) == {1}
    assert int(g.loc[1, "n_blame"]) == 2  # orders 1 and 4
