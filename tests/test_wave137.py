"""Edge-case tests for wave-137 operators: exponential-bucket boundaries on
hand-built cent values (powers of two land in the LOWER bucket's top edge,
zero and negative mirroring), and HHI arithmetic on constructed monopoly /
duopoly brands. The value contract itself is enforced by the parametrized
oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_events(tmp_path, values, types=None):
    n = len(values)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": types if types is not None else ["x"] * n,
            "value": np.asarray(values, dtype=np.float64),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def _write_brand_sales(tmp_path, brands, supps, prices):
    n = len(brands)
    uniq = sorted(set(brands))
    bmap = {b: i + 1 for i, b in enumerate(uniq)}
    part = pd.DataFrame(
        {
            "p_partkey": np.asarray([bmap[b] for b in uniq], dtype=np.int64),
            "p_brand": uniq,
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.asarray([bmap[b] for b in brands], dtype=np.int64),
            "l_suppkey": np.asarray(supps, dtype=np.int64),
            "l_extendedprice": np.asarray(prices, dtype=np.float64),
        }
    )
    for name, df in (("part", part), ("lineitem", li)):
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )
        pq.write_table(t, f"{tmp_path}/{name}.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_exp_histogram_power_of_two_boundaries(tmp_path):
    # cents: 1 -> bucket 1 [1,1]; 2 -> bucket 2 [2,3]; 3 -> bucket 2;
    # 4 -> bucket 3 [4,7]; 0 -> bucket 0; -3 -> bucket -2 [-3,-2].
    _write_events(tmp_path, [0.01, 0.02, 0.03, 0.04, 0.00, -0.03])
    got = _run("events_exp_histogram", tmp_path).set_index("bucket")
    assert int(got.loc[1, "n"]) == 1 and int(got.loc[1, "lo_cents"]) == 1
    assert int(got.loc[1, "hi_cents"]) == 1
    assert int(got.loc[2, "n"]) == 2
    assert (int(got.loc[2, "lo_cents"]), int(got.loc[2, "hi_cents"])) == (2, 3)
    assert int(got.loc[3, "n"]) == 1
    assert (int(got.loc[3, "lo_cents"]), int(got.loc[3, "hi_cents"])) == (4, 7)
    assert int(got.loc[0, "n"]) == 1
    assert (int(got.loc[-2, "lo_cents"]), int(got.loc[-2, "hi_cents"])) == (-3, -2)


def test_exp_histogram_counts_partition_the_input(tmp_path):
    vals = np.linspace(0.01, 400.0, 257)
    _write_events(tmp_path, vals)
    got = _run("events_exp_histogram", tmp_path)
    assert int(got["n"].sum()) == len(vals)
    # every value's cents lie inside its bucket's [lo, hi]
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    for _, r in got.iterrows():
        inb = (cents >= r["lo_cents"]) & (cents <= r["hi_cents"])
        assert int(inb.sum()) == int(r["n"])


def test_hhi_monopoly_and_duopoly(tmp_path):
    # brand M: one supplier -> HHI = 1e6; brand D: 50/50 duopoly -> 5e5;
    # brand U: 75/25 -> 0.625e6.
    _write_brand_sales(
        tmp_path,
        brands=["M", "D", "D", "U", "U"],
        supps=[1, 1, 2, 1, 2],
        prices=[10.0, 5.0, 5.0, 7.5, 2.5],
    )
    got = _run("part_brand_supplier_hhi", tmp_path).set_index("p_brand")
    assert int(got.loc["M", "hhi_micro"]) == 1_000_000
    assert int(got.loc["M", "n_suppliers"]) == 1
    assert int(got.loc["D", "hhi_micro"]) == 500_000
    assert int(got.loc["U", "hhi_micro"]) == 625_000
    assert int(got.loc["U", "total_cents"]) == 1000
