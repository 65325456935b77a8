"""Edge-case tests for wave-133 operators: SAX symbol boundaries on a
hand-built series, and RRF fusion arithmetic on known rankings. The value
contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_events(tmp_path, days, types, values=None):
    n = len(days)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(days).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": types,
            "value": values if values is not None else np.ones(n),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def test_sax_symbols_match_hand_zscores(tmp_path):
    # daily counts for type 'x': [1, 1, 4] over three days
    # n=3, sx=6, sxx=18, nvar=3*18-36=18, den=sqrt(18)
    # z = (x*3-6)/sqrt(18): x=1 -> -3/4.2426 = -0.7071 < -0.6745 -> 'a'
    #                       x=4 -> +6/4.2426 = +1.4142 >= 0.6745 -> 'd'
    days = (
        ["2024-01-01"] * 1 + ["2024-01-02"] * 1 + ["2024-01-03"] * 4
    )
    _write_events(tmp_path, days, ["x"] * 6)
    got = entrymod.queries()["events_sax_daily"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.sort_values("day").reset_index(drop=True)
    assert list(got["symbol"]) == ["a", "a", "d"]
    assert list(got["n_events"]) == [1, 1, 4]


def test_sax_constant_series_excluded(tmp_path):
    _write_events(tmp_path, ["2024-01-01", "2024-01-02"], ["x", "x"])
    got = entrymod.queries()["events_sax_daily"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 0


def test_rrf_fusion_arithmetic_and_ranks():
    got = entrymod.queries()["docs_rrf_fusion"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 20
    # every fused score reconciles with its contributing ranks
    for r in got.itertuples():
        s = 0.0
        if r.rank_bm25 > 0:
            s += 1.0 / (60 + r.rank_bm25)
        if r.rank_len > 0:
            s += 1.0 / (60 + r.rank_len)
        assert int(np.floor(s * 1e8 + 0.5)) == int(r.rrf_e8)
    # at least one doc must appear in both legs or the fused list is trivial;
    # scores are nonincreasing
    v = got["rrf_e8"].to_numpy()
    assert (v[:-1] >= v[1:]).all()
    assert (got["rank_bm25"] > 0).any() and (got["rank_len"] > 0).any()
