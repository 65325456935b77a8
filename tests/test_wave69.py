"""Edge-case tests for wave-69 operators: transition latency on a hand-built
journey (known per-pair medians, cross-user boundary NOT a transition) and
hapax ratio where a token is hapax within one source but repeated in another
(per-source counting). Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values on tiny adversarial tables."""

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


def test_transition_latency_pairs(tmp_path):
    rows = [
        # user 1: view -(10s)-> click -(20s)-> purchase
        ("2024-01-01 00:00:00", 1, "view"),
        ("2024-01-01 00:00:10", 1, "click"),
        ("2024-01-01 00:00:30", 1, "purchase"),
        # user 2: view -(40s)-> click  (second sample for the view->click pair)
        ("2024-01-01 01:00:00", 2, "view"),
        ("2024-01-01 01:00:40", 2, "click"),
    ]
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_transition_latency", str(tmp_path), ["events"]).set_index(
        ["prev_type", "next_type"]
    )
    # view->click: gaps [10, 40], lower median 10
    assert int(g.loc[("view", "click"), "n"]) == 2
    assert int(g.loc[("view", "click"), "p50_s"]) == 10
    assert int(g.loc[("view", "click"), "max_s"]) == 40
    assert int(g.loc[("click", "purchase"), "p50_s"]) == 20
    # user boundary (user1 purchase -> user2 view) must NOT appear
    assert ("purchase", "view") not in g.index


def test_hapax_per_source_scoping(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            # source s1: "alpha beta alpha" -> distinct {alpha:2, beta:1}
            #   -> 2 distinct, 1 hapax -> 5000 bp
            # source s2: "beta beta gamma delta" -> {beta:2, gamma:1, delta:1}
            #   -> 3 distinct, 2 hapax -> (40000+3)//6 = 6667 bp
            # ('beta' is hapax in s1 even though s2 repeats it: per-source)
            "text": ["alpha beta alpha", "beta beta", "gamma delta"],
            "lang": ["en"] * 3,
            "source": ["s1", "s2", "s2"],
            "n_chars": np.array([16, 9, 11], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_hapax_ratio", str(tmp_path), ["documents"]).set_index(
        "source"
    )
    assert int(g.loc["s1", "n_distinct"]) == 2
    assert int(g.loc["s1", "n_hapax"]) == 1
    assert int(g.loc["s1", "hapax_bp"]) == 5000
    assert int(g.loc["s2", "n_distinct"]) == 3
    assert int(g.loc["s2", "n_hapax"]) == 2
    assert int(g.loc["s2", "hapax_bp"]) == 6667
