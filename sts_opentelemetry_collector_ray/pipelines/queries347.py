"""Driver-contract queries, wave 347 — peak-weekday drift (does the
busiest weekday change month to month?) and supplier-brand market entry
(how many supplier x brand relationships are new each year?). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES347: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_peak_weekday_drift — modal weekday stability across months
# ---------------------------------------------------------------------------


def q_events_peak_weekday_drift(sf_dir: str):
    """Seasonal stability: per calendar month the modal epoch-weekday of
    event volume (max count, earliest weekday tie); summary of how
    stable that modal weekday is across months. Pure integer counting.
    One row: n_months, n_distinct_peaks, modal_peak_dow,
    modal_share_micro (months led by the overall most common peak
    weekday)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ym = (
            df["ts"].dt.year.to_numpy(np.int64) * 12
            + df["ts"].dt.month.to_numpy(np.int64) - 1
        )
        dow = (us // _DAY_US) % 7
        g = (
            pd.DataFrame({"ym": ym, "dow": dow})
            .groupby(["ym", "dow"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["ym", "dow"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_months", "n_distinct_peaks", "modal_peak_dow",
            "modal_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    peaks = []
    for ym, sub in h.groupby("ym"):
        sub = sub.sort_values(["c", "dow"], ascending=[False, True])
        peaks.append(int(sub.iloc[0]["dow"]))
    n_m = len(peaks)
    pk = pd.Series(peaks)
    counts = pk.value_counts()
    top_n = int(counts.max())
    modal = int(min(d for d, c in counts.items() if int(c) == top_n))
    return pd.DataFrame(
        [
            (
                np.int64(n_m), np.int64(pk.nunique()), np.int64(modal),
                np.int64(np.floor(
                    float(top_n) / float(n_m) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES347["events_peak_weekday_drift"] = f"""
WITH b AS (
  SELECT CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS ym,
         CAST((epoch_us(ts) // {_DAY_US}) % 7 AS BIGINT) AS dow
  FROM events
),
h AS (
  SELECT ym, dow, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
pk AS (
  SELECT ym, dow FROM (
    SELECT ym, dow,
           row_number() OVER (PARTITION BY ym ORDER BY c DESC, dow) AS rk
    FROM h
  ) WHERE rk = 1
),
cnt AS (SELECT dow, CAST(count(*) AS BIGINT) AS c FROM pk GROUP BY 1),
top AS (
  SELECT min(dow) AS modal, max(cm) AS top_n FROM (
    SELECT dow, c AS cm FROM cnt
    WHERE c = (SELECT max(c) FROM cnt)
  )
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pk),
nd AS (SELECT CAST(count(DISTINCT dow) AS BIGINT) AS d FROM pk)
SELECT nn.n AS n_months, nd.d AS n_distinct_peaks,
       CAST(top.modal AS BIGINT) AS modal_peak_dow,
       CAST(floor(CAST(top.top_n AS DOUBLE) / nn.n * 1000000.0 + 0.5)
            AS BIGINT) AS modal_share_micro
FROM nn, nd, top
WHERE nn.n > 0"""


# ---------------------------------------------------------------------------
# supplier_brand_entry — new supplier x brand relationships per year
# ---------------------------------------------------------------------------


def q_supplier_brand_entry(sf_dir: str):
    """Market entry: per ship year, active supplier x brand pairs and
    those appearing for the FIRST time (min ship year of the pair).
    Pure integer counting. Per year: ship_year, n_active_pairs,
    n_new_pairs, entry_rate_micro.

    Scale shape: (supplier, brand, year) distinct partials via the
    broadcast part->brand map; first-year resolution on the bounded
    pair set."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "sk": df["l_suppkey"].to_numpy(np.int64),
                "brand": df["l_partkey"].map(p2b_).to_numpy(object),
                "yr": df["l_shipdate"].dt.year.to_numpy(np.int64),
            }
        ).drop_duplicates()
        return out

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_partkey", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["ship_year", "n_active_pairs", "n_new_pairs",
            "entry_rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if pairs.empty:
        return empty
    first = pairs.groupby(["sk", "brand"])["yr"].min().rename("fy")
    pairs = pairs.merge(first.reset_index(), on=["sk", "brand"])
    agg = pairs.groupby("yr").agg(
        n_active=("sk", "size"),
        n_new=("fy", lambda s: 0),
    )
    new = (
        pairs[pairs["yr"] == pairs["fy"]]
        .groupby("yr")
        .size()
    )
    agg["n_new"] = new.reindex(agg.index).fillna(0).astype(np.int64)
    out = agg.reset_index().rename(
        columns={"yr": "ship_year", "n_active": "n_active_pairs",
                 "n_new": "n_new_pairs"}
    )
    out["entry_rate_micro"] = np.floor(
        out["n_new_pairs"].to_numpy(np.float64)
        / out["n_active_pairs"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return (
        out.sort_values("ship_year")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols})
    )[cols]


ORACLES347["supplier_brand_entry"] = """
WITH pairs AS (
  SELECT DISTINCT l.l_suppkey AS sk, p.p_brand AS brand,
         CAST(year(l.l_shipdate) AS BIGINT) AS yr
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
first AS (
  SELECT sk, brand, CAST(min(yr) AS BIGINT) AS fy
  FROM pairs GROUP BY 1, 2
),
agg AS (
  SELECT pairs.yr AS ship_year,
         CAST(count(*) AS BIGINT) AS n_active_pairs,
         CAST(sum(CASE WHEN pairs.yr = first.fy THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new_pairs
  FROM pairs JOIN first USING (sk, brand)
  GROUP BY 1
)
SELECT ship_year, n_active_pairs, n_new_pairs,
       CAST(floor(CAST(n_new_pairs AS DOUBLE)
                  / CAST(n_active_pairs AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS entry_rate_micro
FROM agg
ORDER BY ship_year"""


QUERIES347 = {
    "events_peak_weekday_drift": q_events_peak_weekday_drift,
    "supplier_brand_entry": q_supplier_brand_entry,
}
