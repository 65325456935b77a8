"""Edge-case tests for wave-129 operators: lang/source mixture shares
(per-language shares close at 1e6; char mass reconciles with the raw table)
and year-status mix exactness on a hand-computed orders table (cents and
share arithmetic). The value contract itself is enforced by the parametrized
oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def test_lang_source_mix_shares_and_mass():
    got = entrymod.queries()["docs_lang_source_mix"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["n_docs"] > 0).all() and (got["chars"] >= 0).all()
    # per-language micro shares sum to ~1e6 (floor-half-up per cell can drift
    # at most |cells| micro units from exactly 1e6)
    for lang, grp in got.groupby("lang"):
        s = int(grp["lang_share_micro"].sum())
        assert abs(s - 1_000_000) <= len(grp)
    # char mass reconciles with the raw table
    import duckdb

    con = duckdb.connect()
    (tot_chars, tot_docs) = con.execute(
        "SELECT sum(n_chars), count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()
    assert int(got["chars"].sum()) == int(tot_chars)
    assert int(got["n_docs"].sum()) == int(tot_docs)


def test_status_mix_by_year_exact_on_tiny_table(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 2, 2],
            "o_orderstatus": ["F", "F", "O", "F"],
            "o_totalprice": np.array([10.01, 20.02, 30.555, 5.0]),
            "o_orderdate": pd.to_datetime(
                ["1995-01-01", "1995-06-01", "1995-12-31", "1996-03-01"]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    t = pa.Table.from_pandas(orders, preserve_index=False).replace_schema_metadata(
        None
    )
    pq.write_table(t, f"{tmp_path}/orders.parquet")
    got = entrymod.queries()["orders_status_mix_by_year"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.set_index(["order_year", "o_orderstatus"])
    assert int(got.loc[(1995, "F"), "n_orders"]) == 2
    assert int(got.loc[(1995, "F"), "total_cents"]) == 1001 + 2002
    # 30.555 floor-half-up -> 3056 cents
    assert int(got.loc[(1995, "O"), "total_cents"]) == 3056
    assert int(got.loc[(1995, "F"), "year_share_micro"]) == 666667
    assert int(got.loc[(1995, "O"), "year_share_micro"]) == 333333
    assert int(got.loc[(1996, "F"), "year_share_micro"]) == 1_000_000
