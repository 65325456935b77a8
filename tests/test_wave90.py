"""Edge-case tests for wave-90 operators: PMI collocations (an always-
together pair beats a frequent independent pair; min-support filters rare
pairs; bigrams never cross document boundaries) and HHI (monopoly = 1e6,
two equal suppliers = 0.5e6, nation grouping). Ray vs DuckDB equality is
enforced per-query by the strict sweep; these pin analytic values on tiny
adversarial tables."""

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


def test_pmi_collocation_vs_independent(tmp_path):
    # 'new york' always together (5x); 'the'+'dog' co-occur 5x but both are
    # everywhere -> much lower PMI. 'rare gem' appears 4x -> below support.
    texts = []
    for _ in range(5):
        texts.append("new york the dog runs the dog walks the cat")
    for _ in range(4):
        texts.append("rare gem the dog")
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1, len(texts) + 1, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_collocations_pmi", str(tmp_path), ["documents"])
    pairs = {(r.token_a, r.token_b): int(r.pmi_micro) for r in g.itertuples()}
    assert ("new", "york") in pairs
    assert ("rare", "gem") not in pairs  # support 4 < 5
    assert pairs[("new", "york")] > pairs[("the", "dog")]
    # bigrams never cross documents: ('cat','new') would need a boundary jump
    assert ("cat", "new") not in pairs


def test_hhi_monopoly_and_split(tmp_path):
    _write(
        str(tmp_path), "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([0, 1], np.int32),
                "n_name": ["ALGERIA", "BRAZIL"],
                "n_regionkey": np.zeros(2, np.int32),
            }
        ),
    )
    _write(
        str(tmp_path), "supplier",
        pd.DataFrame(
            {
                "s_suppkey": np.array([1, 2, 3], np.int64),
                "s_name": ["a", "b", "c"],
                "s_nationkey": np.array([0, 1, 1], np.int32),
                "s_acctbal": np.zeros(3, np.float64),
            }
        ),
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 3], np.int64),
            "l_partkey": np.ones(3, np.int64),
            "l_suppkey": np.array([1, 2, 3], np.int64),
            "l_linenumber": np.arange(1, 4, dtype=np.int32),
            "l_quantity": np.ones(3, np.float64),
            # nation 0: single supplier -> HHI 1.0
            # nation 1: two equal suppliers (50 each) -> HHI 0.5
            "l_extendedprice": np.array([100.0, 50.0, 50.0], np.float64),
            "l_discount": np.zeros(3, np.float64),
            "l_tax": np.zeros(3, np.float64),
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pd.to_datetime(["1996-01-01"] * 3).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "supplier_hhi_by_nation", str(tmp_path),
        ["nation", "supplier", "lineitem"],
    ).set_index("nation_name")
    assert int(g.loc["ALGERIA", "hhi_micro"]) == 1_000_000
    assert int(g.loc["BRAZIL", "hhi_micro"]) == 500_000
    assert int(g.loc["BRAZIL", "n_suppliers"]) == 2
