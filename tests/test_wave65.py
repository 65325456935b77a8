"""Edge-case tests for wave-65 operators: Holt recurrence hand-computed on a
rising 3-hour series (including a NEGATIVE-trend case for the floor-division
trap) and containment on a quote-inside-a-document pair (asymmetric: high
A→B, low B→A). Ray vs DuckDB equality is enforced per-query by the strict
sweep; these pin analytic values on tiny adversarial tables."""

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


def _events_hours(counts, event_type="a"):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(base + pd.Timedelta(hours=h, minutes=len(rows) % 50))
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(rows).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [event_type] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def _holt(counts):
    S = 1_000_000
    l = counts[0] * S
    b = 0
    for v in counts[1:]:
        l_new = (3 * v * S + 7 * (l + b)) // 10
        b = (2 * (l_new - l) + 8 * b) // 10
        l = l_new
    return l, b, l + 24 * b


def test_holt_rising_series(tmp_path):
    counts = [1, 2, 3]
    _write(str(tmp_path), "events", _events_hours(counts))
    g = _compare("events_holt_forecast", str(tmp_path), ["events"]).iloc[0]
    l, b, f = _holt(counts)
    assert (int(g.level_fp6), int(g.trend_fp6), int(g.forecast_24h_fp6)) == (l, b, f)
    assert b > 0  # rising series -> positive trend


def test_holt_negative_trend_floor_division(tmp_path):
    # falling series (interior zero hour; the grid ends at the LAST observed
    # event, so trailing zeros would vanish) -> negative trend terms
    # exercise the floor-division path
    counts = [5, 1, 0, 1]
    _write(str(tmp_path), "events", _events_hours(counts))
    g = _compare("events_holt_forecast", str(tmp_path), ["events"]).iloc[0]
    l, b, f = _holt(counts)
    assert (int(g.level_fp6), int(g.trend_fp6), int(g.forecast_24h_fp6)) == (l, b, f)
    assert b < 0


def test_containment_asymmetric_quote(tmp_path):
    quote = "the five boxing wizards jump quickly tonight"
    long_doc = (
        "completely unrelated opening content that pads this document "
        + quote
        + " and then even more unrelated trailing filler text continues here"
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [quote, long_doc, "nothing in common with either zzz"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": np.array(
                [len(quote), len(long_doc), 33], np.int64
            ),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_shingle_containment", str(tmp_path), ["documents"])
    pair = g[(g.a == 1) & (g.b == 2)]
    assert len(pair) == 1
    rec = pair.iloc[0]
    # every shingle of the quote appears in the long doc -> C(1->2) = 1.0
    assert int(rec.cont_ab_micro) == 1_000_000
    # the long doc is mostly NOT contained in the quote
    assert int(rec.cont_ba_micro) < 500_000
    # doc 3 pairs with nobody
    assert not ((g.a == 3) | (g.b == 3)).any()
