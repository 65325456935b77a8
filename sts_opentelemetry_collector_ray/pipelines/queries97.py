"""Driver-contract queries, wave 97 — TPC-H Q7 volume shipping (cross-pair
revenue between two nations by ship year — the last TPC-H query expressible
over the fixture schema, completing the family alongside Q8/Q9) and daily
order backlog (the open-interval concurrency curve operations dashboards
live on, via delta partials + one prefix sum). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES97: dict[str, str] = {}

_Q7_BUCKETS = 64
_Q7_N1 = "NATION_2"
_Q7_N2 = "NATION_7"
_Q7_LO = "1995-01-01"
_Q7_HI = "1997-01-01"  # exclusive
_BK_BUCKETS = 64
_DAY_US = 86_400_000_000


def _us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


def _member(sorted_keys: np.ndarray, x: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(x), bool)
    idx = np.minimum(np.searchsorted(sorted_keys, x), len(sorted_keys) - 1)
    return sorted_keys[idx] == x


# ---------------------------------------------------------------------------
# q7_volume_shipping — nation-pair revenue by ship year
# ---------------------------------------------------------------------------


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7: lineitem revenue shipped between '{A}' and '{B}' (either
    direction — supplier in one, customer in the other) with l_shipdate in
    [{LO}, {HI}), grouped by (supp_nation, cust_nation, ship year). Revenue
    is EXACT integer micro-dollars.

    Scale shape: the q8 shape — supplier/customer nation membership arrays
    broadcast once (`ray.put` + searchsorted, no per-row hashing); lineitem
    pre-aggregates per (orderkey, supp side, year) inside each batch; orders
    contribute (orderkey, cust side) rows; ONE tagged orderkey-bucket
    exchange joins them and emits the bounded (side, side, year) grid; the
    driver folds with Python ints.""".format(
        A=_Q7_N1, B=_Q7_N2, LO=_Q7_LO, HI=_Q7_HI
    )
    import ray
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    nname = np.asarray(nat["n_name"].to_numpy(zero_copy_only=False))
    k1 = int(nk[nname == _Q7_N1][0])
    k2 = int(nk[nname == _Q7_N2][0])

    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    snk = supp["s_nationkey"].to_numpy().astype(np.int64)
    s1 = np.sort(sk[snk == k1])
    s2 = np.sort(sk[snk == k2])
    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cnk = cust["c_nationkey"].to_numpy().astype(np.int64)
    c1 = np.sort(ck[cnk == k1])
    c2 = np.sort(ck[cnk == k2])
    dims_ref = ray.put((s1, s2, c1, c2))
    lo_us, hi_us = _us(_Q7_LO), _us(_Q7_HI)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        s1_, s2_, _, _ = ray.get(dims_ref)
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy()
        in1, in2 = _member(s1_, s), _member(s2_, s)
        m = (in1 | in2) & (d >= lo_us) & (d < hi_us)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100
        k, d, rev = k[m], d[m], rev[m]
        side = np.where(in1[m], 1, 2).astype(np.int64)  # supplier's nation
        yr = d.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        df = (
            pd.DataFrame({"k": k, "side": side, "yr": yr, "rev": rev})
            .groupby(["k", "side", "yr"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        df["cside"] = np.int64(0)
        df["_b"] = (df["k"] % _Q7_BUCKETS).astype(np.int64)
        return df[["k", "side", "yr", "rev", "cside", "_b"]]

    def o_rows(t: pa.Table) -> pd.DataFrame:
        _, _, c1_, c2_ = ray.get(dims_ref)
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        c = t["o_custkey"].to_numpy().astype(np.int64)
        in1, in2 = _member(c1_, c), _member(c2_, c)
        m = in1 | in2
        k = k[m]
        return pd.DataFrame(
            {
                "k": k,
                "side": np.zeros(len(k), np.int64),
                "yr": np.zeros(len(k), np.int64),
                "rev": np.zeros(len(k), np.int64),
                "cside": np.where(in1[m], 1, 2).astype(np.int64),
                "_b": (k % _Q7_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["cside"] > 0).to_numpy()
        o = g.loc[is_o, ["k", "cside"]]
        li = g.loc[~is_o, ["k", "side", "yr", "rev"]]
        m = li.merge(o, on="k")
        m = m[m["side"] != m["cside"]]  # cross-nation pairs only
        if m.empty:
            return pd.DataFrame(
                {
                    "side": pd.Series([], dtype=np.int64),
                    "yr": pd.Series([], dtype=np.int64),
                    "rev": pd.Series([], dtype=np.int64),
                }
            )
        return (
            m.groupby(["side", "yr"], sort=False)["rev"].sum().reset_index()
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o).groupby("_b").map_groups(merge, batch_format="pandas").to_pandas()
    )  # bounded: 2 sides × |years| per bucket
    names = {1: _Q7_N1, 2: _Q7_N2}
    rows = []
    if not part.empty and "side" in part.columns:
        for (side, yr), grp in sorted(part.groupby(["side", "yr"])):
            rows.append(
                {
                    "supp_nation": names[int(side)],
                    "cust_nation": names[3 - int(side)],
                    "l_year": int(yr),
                    "revenue_micro": int(sum(int(v) for v in grp["rev"])),
                }
            )
    out = pd.DataFrame(
        rows, columns=["supp_nation", "cust_nation", "l_year", "revenue_micro"]
    )
    return out.astype(
        {"l_year": np.int64, "revenue_micro": np.int64}
        if len(out)
        else {
            "supp_nation": object,
            "cust_nation": object,
            "l_year": np.int64,
            "revenue_micro": np.int64,
        }
    )


ORACLES97["q7_volume_shipping"] = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                * 100) AS BIGINT) AS revenue_micro
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = '{_Q7_N1}' AND cn.n_name = '{_Q7_N2}')
    OR (sn.n_name = '{_Q7_N2}' AND cn.n_name = '{_Q7_N1}'))
  AND l_shipdate >= TIMESTAMP '{_Q7_LO}'
  AND l_shipdate < TIMESTAMP '{_Q7_HI}'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


# ---------------------------------------------------------------------------
# orders_backlog_daily — open-order concurrency curve on the day grid
# ---------------------------------------------------------------------------


def q_orders_backlog_daily(sf_dir: str):
    """Daily backlog: for every day on the dense grid, the number of orders
    placed on-or-before it whose LAST lineitem ship day is still ahead
    (interval [order day, max ship day), so a same-day full ship contributes
    nothing). Orders with no lineitems are excluded (no ship signal).

    Scale shape: lineitem reduces to per-batch (orderkey, max ship day)
    partials; orders contribute (orderkey, order day); ONE tagged
    orderkey-bucket exchange resolves each order's interval and collapses it
    to ±1 deltas per day — only the bounded |days| delta rows leave the
    buckets; the driver folds deltas and takes one prefix sum."""

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        df = (
            pd.DataFrame({"k": k, "sday": d})
            .groupby("k", sort=False)["sday"]
            .max()
            .reset_index()
        )
        df["oday"] = np.int64(-1)
        df["_b"] = (df["k"] % _BK_BUCKETS).astype(np.int64)
        return df[["k", "sday", "oday", "_b"]]

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame(
            {
                "k": k,
                "sday": np.full(len(k), -1, np.int64),
                "oday": d,
                "_b": (k % _BK_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["oday"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "oday"]]
        li = g.loc[~is_o, ["k", "sday"]].groupby("k", sort=False)["sday"].max()
        m = o.merge(li.reset_index(), on="k")
        if m.empty:
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype=np.int64),
                    "dlt": pd.Series([], dtype=np.int64),
                }
            )
        days = np.concatenate([m["oday"].to_numpy(np.int64), m["sday"].to_numpy(np.int64)])
        dlt = np.concatenate(
            [np.ones(len(m), np.int64), np.full(len(m), -1, np.int64)]
        )
        df = (
            pd.DataFrame({"day": days, "dlt": dlt})
            .groupby("day", sort=False)["dlt"]
            .sum()
            .reset_index()
        )
        return df.astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o).groupby("_b").map_groups(merge, batch_format="pandas").to_pandas()
    )  # bounded: |days| rows per bucket
    d = part.groupby("day")["dlt"].sum().sort_index()
    days = d.index.to_numpy(np.int64)
    if len(days) == 0:
        return pd.DataFrame(
            {
                "day": pd.Series([], dtype=np.int64),
                "open_orders": pd.Series([], dtype=np.int64),
            }
        )
    lo, hi = int(days.min()), int(days.max())
    grid = np.arange(lo, hi, dtype=np.int64)  # last delta day itself excluded
    dense = np.zeros(hi - lo, np.int64)
    in_grid = days < hi
    dense[days[in_grid] - lo] = d.to_numpy(np.int64)[in_grid]
    return pd.DataFrame({"day": grid, "open_orders": np.cumsum(dense)})


ORACLES97["orders_backlog_daily"] = f"""
WITH spans AS (
  SELECT o.o_orderkey,
         epoch_us(o.o_orderdate) // {_DAY_US} AS oday,
         max(epoch_us(l.l_shipdate) // {_DAY_US}) AS sday
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
deltas AS (
  SELECT oday AS day, 1 AS dlt FROM spans
  UNION ALL
  SELECT sday, -1 FROM spans
),
d AS (SELECT day, CAST(sum(dlt) AS BIGINT) AS dlt FROM deltas GROUP BY day),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi - 1)) AS BIGINT) AS day FROM b
)
SELECT g.day,
       CAST(sum(coalesce(d.dlt, 0)) OVER (ORDER BY g.day) AS BIGINT)
         AS open_orders
FROM grid g LEFT JOIN d USING (day)
ORDER BY g.day"""


QUERIES97 = {
    "q7_volume_shipping": q7_volume_shipping,
    "orders_backlog_daily": q_orders_backlog_daily,
}
