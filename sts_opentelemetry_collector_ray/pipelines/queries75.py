"""Driver-contract queries, wave 75 — Q22-shaped idle high-balance customers
(above the positive-average balance of their segment group AND no recent
orders: scalar subquery + anti-join) and Q4-shaped late-shipment priority
counts (EXISTS semi-join folded to a per-order max). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly.

The Q22 above-average predicate is DIVISION-FREE: with s = Σ balance-micros
and n = count over positive balances, ``bal_micro · n > s`` compares exact
integers — no float average crosses the engine boundary."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES75: dict[str, str] = {}

_Q22_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE")
_Q22_CUTOFF = "1999-01-01"
_Q22_BUCKETS = 32
_Q4_LO = "1996-01-01"
_Q4_HI = "1996-07-01"
_Q4_LATE_DAYS = 60
_Q4_BUCKETS = 64
_DAY_US = 86_400_000_000


def _day_i64(date_str: str) -> np.int64:
    return np.datetime64(date_str).astype("datetime64[D]").astype(np.int64)


# ---------------------------------------------------------------------------
# q22_idle_customers — above-average balance, no recent orders
# ---------------------------------------------------------------------------


def q_q22_idle_customers(sf_dir: str):
    """TPC-H Q22 shape: among three market segments, customers whose account
    balance exceeds the average POSITIVE balance of that group and who placed
    NO order on/after 1999-01-01 — per segment, the customer count and the
    balance-micro sum.

    Scale shape: pass 1 reduces the segment group to TWO integers (Σ positive
    balance micros, count) via per-batch partials — the division-free
    threshold ships in the task closure. Pass 2 is the anti-join: threshold-
    passing customers and the distinct recent-order custkeys share ONE
    custkey-bucket exchange; each bucket emits per-segment partial (count,
    sum) rows and the driver re-reduces ≤ |segments| rows."""
    seg_list = list(_Q22_SEGMENTS)

    def bal_partial(t: pa.Table) -> pd.DataFrame:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal > 0.0
        bm = np.floor(bal[pos] * 1_000_000.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"s": np.array([bm.sum()], np.int64), "n": np.array([len(bm)], np.int64)}
        )

    import pyarrow.dataset as pads

    seg_read = dict(
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        filter=pads.field("c_mktsegment").isin(seg_list),
    )
    stats = (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", **seg_read)
        .map_batches(bal_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one (s, n) row per batch
    )
    s_tot = int(stats["s"].sum())
    n_tot = int(stats["n"].sum())

    def cust_rows(t: pa.Table) -> pd.DataFrame:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        bm = np.floor(bal * 1_000_000.0 + 0.5).astype(np.int64)
        # bm·n > s ⟺ bm > s//n for n > 0 (exact integers, overflow-free)
        keep = bm > (s_tot // n_tot if n_tot else np.iinfo(np.int64).max)
        k = t["c_custkey"].to_numpy()[keep].astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "seg": np.asarray(t["c_mktsegment"].to_numpy(zero_copy_only=False))[
                    keep
                ],
                "bm": bm[keep],
                "active": np.int64(0),
                "_b": (k % _Q22_BUCKETS).astype(np.int64),
            }
        )

    def active_rows(t: pa.Table) -> pd.DataFrame:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        m = d >= _day_i64(_Q22_CUTOFF)
        k = np.unique(t["o_custkey"].to_numpy()[m].astype(np.int64))
        return pd.DataFrame(
            {
                "k": k,
                "seg": "",
                "bm": np.int64(0),
                "active": np.int64(1),
                "_b": (k % _Q22_BUCKETS).astype(np.int64),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        act = set(g.loc[(g["active"] == 1).to_numpy(), "k"].tolist())
        c = g.loc[(g["active"] == 0).to_numpy(), ["k", "seg", "bm"]]
        idle = c[~c["k"].isin(act)]
        out = idle.groupby("seg", sort=False).agg(
            n_cust=("k", "size"), sm=("bm", "sum")
        )
        return pd.DataFrame(
            {
                "seg": out.index.to_numpy(object),
                "n_cust": out["n_cust"].to_numpy(np.int64),
                "sm": out["sm"].to_numpy(np.int64),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", **seg_read
    ).map_batches(cust_rows, batch_format="pyarrow")
    act = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(active_rows, batch_format="pyarrow")
    part = (
        cust.union(act)
        .groupby("_b")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |segments| rows per bucket
    )
    out = (
        part.groupby("seg", as_index=False)[["n_cust", "sm"]]
        .sum()
        .sort_values("seg", kind="mergesort")
    )
    return pd.DataFrame(
        {
            "c_mktsegment": out["seg"].astype(object),
            "n_cust": out["n_cust"].to_numpy(np.int64),
            "sum_acctbal_micro": out["sm"].to_numpy(np.int64),
        }
    )


_SEG_SQL = ", ".join(f"'{s}'" for s in _Q22_SEGMENTS)
ORACLES75["q22_idle_customers"] = f"""
WITH seg AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 1000000 + 0.5) AS HUGEINT) AS bm,
         c_acctbal
  FROM customer WHERE c_mktsegment IN ({_SEG_SQL})
),
a AS (
  SELECT sum(bm) AS s, CAST(count(*) AS HUGEINT) AS n
  FROM seg WHERE c_acctbal > 0
),
act AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '{_Q22_CUTOFF}'
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bm) AS BIGINT) AS sum_acctbal_micro
FROM seg, a
WHERE bm * n > s
  AND c_custkey NOT IN (SELECT o_custkey FROM act)
GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# q4_priority_late — order-priority counts of late-shipping orders
# ---------------------------------------------------------------------------


def q_q4_priority_late(sf_dir: str):
    """TPC-H Q4 shape: orders placed in [1996-01-01, 1996-07-01) for which
    SOME lineitem shipped more than 60 days after the order date, counted per
    priority. The EXISTS folds to a per-order MAX: ∃ item late ⟺
    max(shipday) > orderday + 60.

    Scale shape: lineitem emits per-batch per-orderkey max-shipday partials;
    window-filtered orders emit (key, day, priority); ONE orderkey-bucket
    exchange; buckets re-max, apply the predicate, and emit per-priority
    partial counts — ≤ 5 rows each; the driver re-reduces ≤ 5·|buckets|
    integers."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        g = pd.DataFrame({"k": k, "msd": d}).groupby(
            "k", sort=False, as_index=False
        ).max()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "msd": g["msd"].to_numpy(np.int64),
                "od": np.int64(-1),
                "prio": "",
                "_b": (g["k"].to_numpy(np.int64) % _Q4_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        m = (d >= _day_i64(_Q4_LO)) & (d < _day_i64(_Q4_HI))
        k = t["o_orderkey"].to_numpy()[m].astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "msd": np.int64(-1),
                "od": d[m],
                "prio": np.asarray(
                    t["o_orderpriority"].to_numpy(zero_copy_only=False)
                )[m],
                "_b": (k % _Q4_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["od"] >= 0).to_numpy()
        ms = (
            g.loc[~is_o, ["k", "msd"]]
            .groupby("k", sort=False, as_index=False)
            .max()
        )
        j = g.loc[is_o, ["k", "od", "prio"]].merge(ms, on="k")
        late = j[j["msd"].to_numpy() > j["od"].to_numpy() + _Q4_LATE_DAYS]
        out = late.groupby("prio", sort=False).size()
        return pd.DataFrame(
            {
                "prio": out.index.to_numpy(object),
                "n": out.to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ 5 priority rows per bucket
    )
    out = (
        part.groupby("prio", as_index=False)["n"]
        .sum()
        .sort_values("prio", kind="mergesort")
    )
    return pd.DataFrame(
        {
            "o_orderpriority": out["prio"].astype(object),
            "order_count": out["n"].to_numpy(np.int64),
        }
    )


ORACLES75["q4_priority_late"] = f"""
WITH lw AS (
  SELECT l_orderkey,
         max(epoch_us(l_shipdate) // {_DAY_US}) AS msd
  FROM lineitem GROUP BY 1
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders JOIN lw ON l_orderkey = o_orderkey
WHERE o_orderdate >= DATE '{_Q4_LO}' AND o_orderdate < DATE '{_Q4_HI}'
  AND msd > epoch_us(o_orderdate) // {_DAY_US} + {_Q4_LATE_DAYS}
GROUP BY 1 ORDER BY 1"""


QUERIES75 = {
    "q22_idle_customers": q_q22_idle_customers,
    "q4_priority_late": q_q4_priority_late,
}
