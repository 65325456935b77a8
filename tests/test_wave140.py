"""Edge-case tests for wave-140 operators: price-dispersion arithmetic on a
hand-built constant / spread part (cv = 0 vs known ratio, singleton parts
excluded) and ANOVA eta² at its extremes (all between-variance -> 1, equal
groups with identical spread -> 0 within rounding of the floor-div
contract). The value contract itself is enforced by the parametrized oracle
gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_lineitem(tmp_path, parts, qtys, prices):
    n = len(parts)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.asarray(parts, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_quantity": np.asarray(qtys, dtype=np.float64),
            "l_extendedprice": np.asarray(prices, dtype=np.float64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")


def _write_docs(tmp_path, langs, n_chars):
    n = len(langs)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x" * c for c in n_chars],
            "lang": langs,
            "source": ["web"] * n,
            "n_chars": np.asarray(n_chars, dtype=np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_price_dispersion_constant_and_spread(tmp_path):
    # part 1: unit price 5.00 on both lines -> cv = 0, mean 500 cents
    # part 2: unit prices 4.00 and 6.00 -> sd/mean = 1/5 -> 200000 micro
    # part 3: single line -> absent
    _write_lineitem(
        tmp_path,
        parts=[1, 1, 2, 2, 3],
        qtys=[2.0, 4.0, 1.0, 1.0, 1.0],
        prices=[10.0, 20.0, 4.0, 6.0, 9.0],
    )
    got = _run("lineitem_price_dispersion", tmp_path).set_index("l_partkey")
    assert int(got.loc[1, "cv_micro"]) == 0
    assert int(got.loc[1, "mean_cents"]) == 500
    assert int(got.loc[2, "cv_micro"]) == 200_000
    assert 3 not in got.index
    assert int(got.loc[2, "n_lines"]) == 2


def test_anova_pure_between_variance(tmp_path):
    # every group internally constant -> eta² = 1 (up to the documented
    # per-group floor, which is exact here because ng divides Tg²·n).
    _write_docs(tmp_path, ["en", "en", "fr", "fr"], [10, 10, 30, 30])
    got = _run("docs_length_anova", tmp_path)
    assert int(got["eta2_micro"].iloc[0]) == 1_000_000
    assert int(got["n_langs"].iloc[0]) == 2
    assert int(got["n_docs"].iloc[0]) == 4


def test_anova_no_between_variance(tmp_path):
    # identical group means and spreads -> SSB = 0 -> eta² = 0.
    _write_docs(tmp_path, ["en", "en", "fr", "fr"], [10, 30, 10, 30])
    got = _run("docs_length_anova", tmp_path)
    assert int(got["eta2_micro"].iloc[0]) == 0
