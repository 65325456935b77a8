"""Edge-case tests for wave-77 operators: langid-eval confusion matrix (a
text engineered to classify as English under a French label lands in the
off-diagonal cell; empty text predicts 'und') and the table profiler (null
accounting, micro-canonical float min/max incl. a negative value,
lexicographic canonical ordering where "10" < "9"). Ray vs DuckDB equality is
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


def test_langid_eval_offdiagonal_and_und(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog and the cat",
                # labeled fr but written in English -> off-diagonal cell
                "this is definitely english text with the usual words and things",
                "",  # empty -> 'und'
            ],
            "lang": ["en", "fr", "de"],
            "source": ["web"] * 3,
            "n_chars": np.array([56, 63, 0], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_langid_eval", str(tmp_path), ["documents"])
    cells = {(r.lang_true, r.lang_pred): int(r.n_docs) for r in g.itertuples()}
    assert cells[("en", "en")] == 1
    assert cells[("fr", "en")] == 1  # the mislabeled/misclassified cell
    assert cells[("de", "und")] == 1


def test_profile_nulls_negatives_and_lex_order(tmp_path):
    li = pd.DataFrame(
        {
            # "10" < "9" lexicographically -> min_repr "10", max_repr "9"
            "l_orderkey": np.array([9, 10, 10], np.int64),
            "l_partkey": np.array([1, 1, 1], np.int64),
            "l_suppkey": np.array([1, 2, 3], np.int64),
            "l_linenumber": np.array([1, 2, 3], np.int32),
            "l_quantity": np.array([1.0, 2.0, 2.0], np.float64),
            "l_extendedprice": np.array([10.5, 10.5, 10.5], np.float64),
            # negative float -> micro canonical "-25000"
            "l_discount": np.array([-0.025, 0.05, 0.05], np.float64),
            "l_tax": np.zeros(3, np.float64),
            "l_returnflag": pd.array(["R", None, "A"], dtype=object),
            "l_linestatus": ["O", "F", "O"],
            "l_shipdate": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare("lineitem_profile", str(tmp_path), ["lineitem"]).set_index("column")
    assert int(g.loc["l_returnflag", "n_null"]) == 1
    assert int(g.loc["l_returnflag", "n_distinct"]) == 2
    assert int(g.loc["l_orderkey", "n_distinct"]) == 2
    assert g.loc["l_orderkey", "min_repr"] == "10"  # lexicographic contract
    assert g.loc["l_orderkey", "max_repr"] == "9"
    assert g.loc["l_discount", "min_repr"] == "-25000"
    assert int(g.loc["l_extendedprice", "n_distinct"]) == 1
