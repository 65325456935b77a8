"""Edge-case tests for wave-87 operators: Q9 profit (margin can go negative;
partial-batch quantization sums equal the whole-group floor because retail
micro-prices times integral quantities are exact integers; nation rollup) and
LSH evaluation (a planted near-dup pair is found by both sides on a tiny
slice → precision = recall = 1). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values on tiny adversarial
tables."""

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


def test_q9_profit_negative_margin_and_rollup(tmp_path):
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
                "s_suppkey": np.array([1, 2], np.int64),
                "s_name": ["s1", "s2"],
                "s_nationkey": np.array([0, 1], np.int32),
                "s_acctbal": np.zeros(2, np.float64),
            }
        ),
    )
    _write(
        str(tmp_path), "part",
        pd.DataFrame(
            {
                "p_partkey": np.array([1, 2], np.int64),
                "p_name": ["pa", "pb"],
                "p_brand": ["Brand#1"] * 2,
                "p_type": ["STANDARD"] * 2,
                "p_size": np.ones(2, np.int32),
                "p_retailprice": np.array([10.00, 50.00], np.float64),
            }
        ),
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 3], np.int64),
            "l_partkey": np.array([1, 1, 2], np.int64),
            "l_suppkey": np.array([1, 1, 2], np.int64),
            "l_linenumber": np.array([1, 2, 3], np.int32),
            # part 1, supp 1: rev 30+14=44, cost 10*(2+1)=30 -> margin 14
            # part 2, supp 2: rev 40, cost 50*1=50 -> margin -10 (negative)
            "l_quantity": np.array([2.0, 1.0, 1.0], np.float64),
            "l_extendedprice": np.array([30.0, 14.0, 40.0], np.float64),
            "l_discount": np.zeros(3, np.float64),
            "l_tax": np.zeros(3, np.float64),
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pd.to_datetime(
                ["1996-03-01", "1996-07-01", "1996-05-01"]
            ).astype("datetime64[us]"),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "q9_profit", str(tmp_path), ["nation", "supplier", "part", "lineitem"]
    ).set_index(["nation_name", "ship_year"])
    assert int(g.loc[("ALGERIA", 1996), "margin_micro"]) == 14_000_000
    assert int(g.loc[("BRAZIL", 1996), "margin_micro"]) == -10_000_000


def test_lsh_eval_planted_dup(tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the morning sun with great interest"
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [base, base + " indeed", "completely different words here"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([len(base), len(base) + 7, 31], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_lsh_eval", str(tmp_path), ["documents"])
    assert int(g.loc[0, "n_exact_pairs"]) == 1
    assert int(g.loc[0, "n_common"]) == int(g.loc[0, "n_lsh_pairs"])
    assert int(g.loc[0, "recall_micro"]) == 1_000_000
