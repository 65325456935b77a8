"""Edge-case tests for wave-92 operators: business-day latency (a
Friday→Monday shipment is 1 business day; weekend-only spans are 0; the
floor-mean handles negative latencies) and bag-of-words dedup (shuffled word
order collides, different multiplicity does NOT, the dup group ranks first).
Ray vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

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
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_busday_weekend_skip(tmp_path):
    # 2024-01-05 is a Friday; 2024-01-08 the following Monday.
    orders = _orders(
        [
            (1, "2024-01-05"),  # Fri -> Mon: (Fri, Mon] = {Sat,Sun,Mon} -> 1
            (2, "2024-01-06"),  # Sat -> Sun: 0 business days
            (3, "2024-01-01"),  # Mon -> Fri same week: 4 business days
        ]
    )
    li = _lineitem(
        [(1, "2024-01-08"), (2, "2024-01-07"), (3, "2024-01-05")]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "orders_busday_latency", str(tmp_path), ["orders", "lineitem"]
    ).set_index("order_month")
    # all three orders in 2024-01: busdays [1, 0, 4] -> mean 5/3, max 4
    assert int(g.loc[202401, "n_orders"]) == 3
    assert int(g.loc[202401, "max_busdays"]) == 4
    assert int(g.loc[202401, "mean_busdays_micro"]) == 5_000_000 // 3


def test_bow_dedup_shuffle_vs_multiplicity(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], np.int64),
            "text": [
                "alpha beta gamma",
                "gamma alpha beta",  # shuffled -> same multiset as doc 1
                "alpha alpha beta gamma",  # extra 'alpha' -> different
                "delta epsilon",  # unrelated
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": np.array([16, 16, 22, 13], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_bow_dedup", str(tmp_path), ["documents"])
    top = g.sort_values(["n_docs", "key"], ascending=[False, True]).iloc[0]
    assert int(top["n_docs"]) == 2  # the shuffled pair
    assert int(top["min_doc_id"]) == 1
    # exactly one group of size 2; the others are singletons
    assert (g["n_docs"] >= 2).sum() == 1
    assert len(g) == 3  # three distinct fingerprints total
