"""Edge-case tests for wave-111 operators: kNN label agreement (a planted
two-cluster geometry agrees 100%; a probe mislabeled inside the other
cluster is voted down; vote ties break to the smaller label) and tool arg
profile (mode with tie → lexicographically smaller arg; distinct counts
survive the arg-hash bucketing). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values."""

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


def test_knn_agreement_two_clusters(tmp_path):
    rng = np.random.default_rng(11)
    d = 64
    a = np.zeros(d); a[0] = 1.0
    b = np.zeros(d); b[1] = 1.0
    vecs, labs = [], []
    for i in range(10):  # label 0 cluster around a
        vecs.append(a + 0.01 * rng.standard_normal(d)); labs.append(0)
    for i in range(10):  # label 1 cluster around b
        vecs.append(b + 0.01 * rng.standard_normal(d)); labs.append(1)
    # one mislabeled point: sits in cluster b but labeled 0
    vecs.append(b + 0.01 * rng.standard_normal(d)); labs.append(0)
    _write(
        str(tmp_path),
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
                "label": np.array(labs, np.int32),
            }
        ),
    )
    g = _compare("emb_knn_label_agreement", str(tmp_path), ["embeddings"]).set_index(
        "label"
    )
    # label 1 probes agree fully; the mislabeled 0-probe drags label 0 down
    assert int(g.loc[1, "agree_bp"]) == 10_000
    assert int(g.loc[0, "n_probes"]) == 11
    assert int(g.loc[0, "n_agree"]) == 10
    assert int(g.loc[0, "agree_bp"]) == 10 * 10_000 // 11


def test_tools_arg_profile_mode_and_distincts(tmp_path):
    # purchase events produce search(q<k>) calls; craft ks so 'search' has
    # args q1×2, q2×2 (tie → q1 wins lexicographically), q3×1
    rows = []
    ks = [1, 1, 2, 2, 3]
    for i, k in enumerate(ks):
        rows.append((i + 1, f"2024-01-01 10:{i:02d}", 1, "purchase", f'{{"k": {k}}}'))
    # one error event → bash(q9)
    rows.append((9, "2024-01-01 11:00", 1, "error", '{"k": 9}'))
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(len(rows)),
            "props": [r[4] for r in rows],
        },
    ))
    g = _compare("tools_arg_profile", str(tmp_path), ["events"]).set_index("tool")
    assert int(g.loc["search", "n_calls"]) == 5
    assert int(g.loc["search", "n_distinct_args"]) == 3
    assert g.loc["search", "mode_arg"] == "q1"  # tie with q2 → lexicographic
    assert int(g.loc["search", "mode_n"]) == 2
    assert int(g.loc["bash", "n_calls"]) == 1
    assert g.loc["bash", "mode_arg"] == "q9"
