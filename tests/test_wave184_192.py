"""Edge-case tests for waves 184-192: end-of-month share bounds, token
census, link-prediction invariants, join-size estimation, GPD exceedances,
Neyman symmetric allocation, running records, two-way ANOVA invariants,
KMV error bounds, RAKE stopword exclusion, spectral entropy bounds,
Mann-Kendall hand case, Haar hand case, Burrows bounds, runs-test hand case,
Roaring container kinds, rendezvous-hash conservation. Value contracts are
enforced by the parametrized oracle gate; these pin semantics on tiny or
real inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def _write_events(tmp_path, ts, users=None, types=None, values=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": (
                np.asarray(users, dtype=np.int64)
                if users is not None
                else np.ones(n, dtype=np.int64)
            ),
            "event_type": types if types is not None else ["x"] * n,
            "value": (
                np.asarray(values, dtype=np.float64)
                if values is not None
                else np.ones(n)
            ),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def _write_orders(tmp_path, dates):
    n = len(dates)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.ones(n, dtype=np.int64),
            "o_orderstatus": ["F"] * n,
            "o_totalprice": np.full(n, 100.0),
            "o_orderdate": pd.to_datetime(dates).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/orders.parquet")


# ---- wave 184 -------------------------------------------------------------


def test_eom_share_bounds():
    got = _run("lineitem_eom_share")
    assert (got["n_eom"] <= got["n_lines"]).all()
    assert got["eom_share_micro"].between(0, 1_000_000).all()


def test_part_token_census_bounds():
    got = _run("part_name_token_census")
    assert len(got) <= 20
    assert (got["n_parts"] <= got["n"]).all()
    assert (got["token"].str.len() > 0).all()


# ---- wave 185 -------------------------------------------------------------


def test_link_prediction_invariants():
    got = _run("supplier_link_prediction")
    assert len(got) <= 20
    assert (got["s1"] < got["s2"]).all()
    assert (got["common"] <= got["n_union"]).all()
    assert got["jacc_micro"].between(0, 1_000_000).all()
    # sorted by score desc
    assert (np.diff(got["jacc_micro"].to_numpy()) <= 0).all()


def test_join_size_estimate_invariants():
    got = _run("join_size_estimate")
    assert (got["n_distinct_pk"] <= got["n_rows"]).all()
    # every lineitem row joins at least itself
    assert (got["actual_rows"] >= got["n_rows"]).all()
    assert (got["est_rows"] > 0).all()


# ---- wave 186 -------------------------------------------------------------


def test_pot_gpd_hand_case(tmp_path):
    # 96 zeros + two 10s + two 20s: u = 0.6 + 2*sqrt(9.64) ~ 6.81 ->
    # 4 exceedances with positive excess variance
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 100,
        values=[0.0] * 96 + [10.0, 10.0, 20.0, 20.0],
    )
    got = _run("events_pot_gpd", tmp_path)
    assert len(got) == 1
    assert int(got["n_exceed"].iloc[0]) == 4


def test_neyman_symmetric_split(tmp_path):
    # two strata, same size and same sigma -> 5000 each, both rules
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 200,
        types=["a"] * 100 + ["b"] * 100,
        values=[0.0, 1.0] * 100,
    )
    got = _run("events_neyman_allocation", tmp_path)
    assert list(got["neyman_alloc"]) == [5000, 5000]
    assert list(got["prop_alloc"]) == [5000, 5000]


# ---- wave 187 -------------------------------------------------------------


def test_running_records_hand_case(tmp_path):
    # daily counts 1,3,2,5 -> records on days 1,2,4
    ts = (
        ["2024-01-01"] * 1 + ["2024-01-02"] * 3
        + ["2024-01-03"] * 2 + ["2024-01-04"] * 5
    )
    _write_events(tmp_path, ts=ts)
    got = _run("events_running_records", tmp_path)
    assert int(got["n_days"].iloc[0]) == 4
    assert int(got["n_records"].iloc[0]) == 3
    assert int(got["last_record_day"].iloc[0]) == 20240104
    assert int(got["max_daily"].iloc[0]) == 5


def test_twoway_anova_invariants():
    got = _run("lineitem_twoway_anova")
    assert int(got["n_cells"].iloc[0]) <= 6
    assert int(got["ss_err_micro"].iloc[0]) >= 0
    assert int(got["ss_a_micro"].iloc[0]) >= 0
    assert int(got["ss_b_micro"].iloc[0]) >= 0


# ---- wave 188 -------------------------------------------------------------


def test_kmv_distinct_bounds():
    got = _run("docs_kmv_distinct", "/root/testdata/sf0.01")
    assert (got["n_exact"] > 0).all()
    assert (got["est"] > 0).all()
    # KMV with K=256 stays well inside 30% relative error
    assert (got["err_micro"] < 300_000).all()


def test_rake_excludes_stopwords():
    got = _run("docs_rake_keywords")
    assert len(got) <= 20
    for phrase in got["phrase"]:
        assert "the" not in phrase.split()
        assert "a" not in phrase.split()
    assert (got["score_micro"] > 0).all()


# ---- wave 189 -------------------------------------------------------------


def test_spectral_entropy_bounds():
    got = _run("events_spectral_entropy")
    assert got["entropy_micro"].between(0, 1_000_001).all()
    assert got["lowfreq_share_micro"].between(0, 1_000_000).all()


def test_mann_kendall_hand_case(tmp_path):
    # monthly counts 1,2,3 -> S=3, no ties, V = 3*2*11 = 66
    dates = ["2024-01-15"] + ["2024-02-15"] * 2 + ["2024-03-15"] * 3
    _write_orders(tmp_path, dates)
    got = _run("orders_mann_kendall", tmp_path)
    assert int(got["n_months"].iloc[0]) == 3
    assert int(got["s_stat"].iloc[0]) == 3
    assert int(got["var_num"].iloc[0]) == 66


# ---- wave 190 -------------------------------------------------------------


def test_haar_energy_hand_case(tmp_path):
    # daily counts 1,1,2,2: level1 details 0,0; level2 detail -2 -> all
    # energy at level 2
    ts = (
        ["2024-01-01"] * 1 + ["2024-01-02"] * 1
        + ["2024-01-03"] * 2 + ["2024-01-04"] * 2
    )
    _write_events(tmp_path, ts=ts)
    got = _run("events_haar_energy", tmp_path).set_index("level")
    assert int(got.loc[1, "energy_num"]) == 0
    assert int(got.loc[2, "energy_num"]) == 4
    assert int(got.loc[1, "share_micro"]) == 0
    assert int(got.loc[2, "share_micro"]) == 1_000_000


def test_burrows_delta_bounds():
    got = _run("docs_burrows_delta")
    assert len(got) <= 10
    assert (got["s1"] < got["s2"]).all()
    assert (got["delta_micro"] >= 0).all()
    assert (got["n_words"] <= 30).all()


# ---- wave 191 -------------------------------------------------------------


def test_gev_maxima_invariants():
    got = _run("events_gev_maxima", "/root/testdata/sf0.01")
    assert (got["n_blocks"] >= 3).all()
    assert (got["sigma_micro"] > 0).all()
    assert (got["l2_micro"] > 0).all()


def test_runs_test_hand_case(tmp_path):
    # daily counts 1,2,9,2,9,2,9 -> median 2 (dropped), signs -,+,+,+:
    # runs=2, n1=3, n2=1, z = (2 - 2.5) / 0.5 = -1
    counts = [1, 2, 9, 2, 9, 2, 9]
    ts = []
    for d, c in enumerate(counts, start=1):
        ts += [f"2024-01-0{d}"] * c
    _write_events(tmp_path, ts=ts)
    got = _run("events_runs_test", tmp_path)
    assert int(got["n_above"].iloc[0]) == 3
    assert int(got["n_below"].iloc[0]) == 1
    assert int(got["runs"].iloc[0]) == 2
    assert int(got["z_micro"].iloc[0]) == -1_000_000


# ---- wave 192 -------------------------------------------------------------


def test_roaring_kinds(tmp_path):
    # type a: users 0..9 consecutive -> one run container (2+4 bytes);
    # type b: users 0,2,..,18 -> 10 runs, array (20 bytes) wins
    ts = ["2024-01-01"] * 20
    users = list(range(10)) + list(range(0, 20, 2))
    types = ["a"] * 10 + ["b"] * 10
    _write_events(tmp_path, ts=ts, users=users, types=types)
    got = _run("events_roaring_census", tmp_path).set_index("event_type")
    assert int(got.loc["a", "n_run"]) == 1
    assert int(got.loc["a", "bytes_total"]) == 6
    assert int(got.loc["b", "n_array"]) == 1
    assert int(got.loc["b", "bytes_total"]) == 20


def test_rendezvous_conservation():
    got = _run("events_rendezvous_hash")
    # moved users all land on the new shard s4 (HRW minimal-disruption)
    s4_after = int(got.set_index("shard").loc[4, "n_after"])
    assert int(got["n_moved"].sum()) == s4_after
    assert (got["n_moved"] <= got["n_before"]).all()
    old = got[got["shard"] < 4]
    assert (
        old["n_after"].to_numpy() == (old["n_before"] - old["n_moved"]).to_numpy()
    ).all()
    assert int(got.set_index("shard").loc[4, "n_before"]) == 0
