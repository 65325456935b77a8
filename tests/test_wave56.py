"""Edge-case tests for wave-56 operators: Q19-shaped disjunctive revenue on a
hand-built part/lineitem pair (one hit per branch, one near-miss per
predicate) and matryoshka overlap on constructed vectors where the prefix
ranking provably agrees/disagrees with the full ranking. Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic values
on tiny adversarial tables."""

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


def test_q19_branches_and_near_misses(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3, 4], np.int64),
            "p_name": ["a", "b", "c", "d"],
            "p_brand": ["Brand#12", "Brand#23", "Brand#34", "Brand#12"],
            "p_type": ["t"] * 4,
            "p_size": np.array([5, 10, 15, 6], np.int32),  # part 4: size too big
            "p_retailprice": np.ones(4, np.float64),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, 6, dtype=np.int64),
            "l_partkey": np.array([1, 2, 3, 4, 1], np.int64),
            "l_suppkey": np.ones(5, np.int64),
            "l_linenumber": np.ones(5, np.int64),
            # row 5: quantity 12 misses branch-1's 1..11 range
            "l_quantity": np.array([11.0, 20.0, 30.0, 5.0, 12.0]),
            "l_extendedprice": np.array([10.0, 20.0, 30.0, 40.0, 50.0]),
            "l_discount": np.array([0.10, 0.00, 0.05, 0.0, 0.0]),
            "l_tax": np.zeros(5),
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * 5).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "part", part)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("q19_brand_quantity", str(tmp_path), ["part", "lineitem"])
    g = g.set_index("p_brand")
    # branch hits: row1 (10.00 @ 10% = 9.0), row2 (20.00 @ 0%), row3 (30 @ 5%)
    assert int(g.loc["Brand#12", "revenue_micro"]) == 9_000_000
    assert int(g.loc["Brand#23", "revenue_micro"]) == 20_000_000
    assert int(g.loc["Brand#34", "revenue_micro"]) == 28_500_000
    assert int(g.loc["ALL", "n_items"]) == 3
    assert int(g.loc["ALL", "revenue_micro"]) == 57_500_000


def test_matryoshka_prefix_divergence(tmp_path):
    # query (id 1) = e0. Decoy (id 2): prefix identical to the query but a
    # huge orthogonal tail -> prefix cosine 1.0, full cosine tiny.
    # Goods (ids 3..13): prefix e0 plus a tail of size 0.1*id -> full cosine
    # strictly decreasing in id, prefix cosine exactly 1.0 for all.
    # Full top-10: goods 3..12 (decoy ranks last). Prefix top-10: all tie at
    # 1.0 -> id order -> {2, 3..11}. Intersection = {3..11} -> 9 common.
    dim, k = 64, 10
    vecs, ids = [], []

    def mk(vid, tail):
        v = np.zeros(dim)
        v[0] = 1.0
        v[32] = tail
        ids.append(vid)
        vecs.append(v)

    mk(1, 0.0)  # query
    mk(2, 100.0)  # decoy
    for i in range(3, 14):
        mk(i, 0.1 * i)
    t = pa.table(
        {
            "vec_id": pa.array(np.array(ids, np.int64)),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(vecs), np.int32)),
        }
    )
    _write(str(tmp_path), "embeddings", t)
    g = _compare("emb_matryoshka_overlap", str(tmp_path), ["embeddings"])
    rec = g[g.query_id == 1].iloc[0]
    assert int(rec.n_common) == 9
    assert int(rec.k) == k
