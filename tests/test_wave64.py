"""Edge-case tests for wave-64 operators: winnowing on a repetitive string
(shared windows select the SAME (pos,hash) once — the dedup property) and a
too-short doc (no full window -> excluded); Q14 promo share on hand-split
revenue (exact basis points, months separated). Ray vs DuckDB equality is
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


def test_winnow_dedup_and_short_doc(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            # doc 1: all-same char -> every gram identical -> ONE fingerprint
            # doc 2: 7 chars -> 3 grams < window 4 -> excluded
            # doc 3: normal text -> >= 1 fingerprint, oracle checks values
            "text": ["a" * 20, "abcdefg", "the quick brown fox jumps"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": np.array([20, 7, 25], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_winnow_fingerprints", str(tmp_path), ["documents"])
    assert set(g.doc_id) == {1, 3}  # doc 2 excluded
    rec1 = g[g.doc_id == 1].iloc[0]
    # identical grams: rightmost-min selects each window's END position ->
    # 16 gram positions give full windows ending at 4..16 = 13 fingerprints
    assert int(rec1.n_fp) == 13
    rec3 = g[g.doc_id == 3].iloc[0]
    assert int(rec3.n_fp) >= 1


def test_q14_promo_share_two_months(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2], np.int64),
            "p_name": ["a", "b"],
            "p_brand": ["Brand#11", "Brand#12"],
            "p_type": ["PROMO", "STANDARD"],
            "p_size": np.array([1, 1], np.int32),
            "p_retailprice": np.ones(2, np.float64),
        }
    )
    li_rows = [
        # Jan: promo 25.00, other 75.00 -> share 25.00% = 2500 bp
        (1, 25.0, "2024-01-05"),
        (2, 75.0, "2024-01-20"),
        # Feb: promo only -> 10000 bp
        (1, 10.0, "2024-02-01"),
    ]
    nl = len(li_rows)
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, nl + 1, dtype=np.int64),
            "l_partkey": np.array([r[0] for r in li_rows], np.int64),
            "l_suppkey": np.ones(nl, np.int64),
            "l_linenumber": np.ones(nl, np.int64),
            "l_quantity": np.ones(nl, np.float64),
            "l_extendedprice": np.array([r[1] for r in li_rows], np.float64),
            "l_discount": np.zeros(nl, np.float64),
            "l_tax": np.zeros(nl, np.float64),
            "l_returnflag": ["N"] * nl,
            "l_linestatus": ["O"] * nl,
            "l_shipdate": pd.to_datetime([r[2] for r in li_rows]).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "part", part)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("q14_promo_share", str(tmp_path), ["part", "lineitem"]).set_index(
        "ship_month"
    )
    assert int(g.loc["2024-01", "promo_share_bp"]) == 2500
    assert int(g.loc["2024-01", "promo_micro"]) == 25_000_000
    assert int(g.loc["2024-02", "promo_share_bp"]) == 10_000
