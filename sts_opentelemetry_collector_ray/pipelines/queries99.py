"""Driver-contract queries, wave 99 — split-shipment rate (orders whose
lines ship on more than one distinct day, by order month: the fulfillment
KPI behind carrier-consolidation work) and schedule affinity (per-user
hour-of-week profile cosine against the global profile — the
behavioral-typicality screen that flags bots and shared accounts). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES99: dict[str, str] = {}

_SS_BUCKETS = 64
_SA_BUCKETS = 32
_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# orders_split_shipments — multi-ship-day order share by order month
# ---------------------------------------------------------------------------


def q_orders_split_shipments(sf_dir: str):
    """Split-shipment rate: per order month, how many orders shipped their
    lines across >1 distinct ship day, and the share in exact integer basis
    points (split·10⁴ // orders). Orders with no lineitems don't count.

    Scale shape: lineitem pre-reduces per batch to per-(orderkey) distinct
    ship-day MIN/MAX partials (distinct-day >1 ⇔ min<max — no day sets
    shipped around); orders contribute (orderkey, month); ONE tagged
    orderkey-bucket exchange resolves each order, and only the bounded
    (month, n, n_split) grid leaves the buckets."""

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        g = (
            pd.DataFrame({"k": k, "lo": d, "hi": d})
            .groupby("k", sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
            .reset_index()
        )
        g["mon"] = np.int64(-1)
        g["_b"] = (g["k"] % _SS_BUCKETS).astype(np.int64)
        return g[["k", "lo", "hi", "mon", "_b"]]

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy()
        mon = (
            d.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        )  # months since 1970-01
        return pd.DataFrame(
            {
                "k": k,
                "lo": np.zeros(len(k), np.int64),
                "hi": np.zeros(len(k), np.int64),
                "mon": mon,
                "_b": (k % _SS_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["mon"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "mon"]]
        li = (
            g.loc[~is_o, ["k", "lo", "hi"]]
            .groupby("k", sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
            .reset_index()
        )
        m = o.merge(li, on="k")
        if m.empty:
            return pd.DataFrame(
                {
                    "mon": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                    "n_split": pd.Series([], dtype=np.int64),
                }
            )
        split = (m["lo"] < m["hi"]).astype(np.int64)
        h = (
            pd.DataFrame({"mon": m["mon"].to_numpy(np.int64), "split": split})
            .groupby("mon", sort=False)["split"]
            .agg(["size", "sum"])
            .reset_index()
        )
        h.columns = ["mon", "n", "n_split"]
        return h.astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o).groupby("_b").map_groups(merge, batch_format="pandas").to_pandas()
    )  # bounded: |months| rows per bucket
    g = part.groupby("mon")[["n", "n_split"]].sum().sort_index().reset_index()
    n = g["n"].to_numpy(np.int64)
    s = g["n_split"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "order_month": g["mon"].to_numpy(np.int64),
            "n_orders": n,
            "n_split": s,
            "split_bp": s * 10_000 // np.maximum(n, 1),
        }
    )


ORACLES99["orders_split_shipments"] = f"""
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(datediff('month', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS BIGINT) AS order_month,
         min(epoch_us(l.l_shipdate) // {_DAY_US}) AS lo,
         max(epoch_us(l.l_shipdate) // {_DAY_US}) AS hi
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (lo < hi) AS BIGINT) AS n_split,
       CAST(count(*) FILTER (lo < hi) * 10000
            // greatest(count(*), 1) AS BIGINT) AS split_bp
FROM spans GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# events_schedule_affinity — per-user hour-of-week cosine vs global profile
# ---------------------------------------------------------------------------


def q_events_schedule_affinity(sf_dir: str):
    """Schedule typicality: each user's 168-bin hour-of-week activity
    profile scored by cosine similarity against the GLOBAL profile — low
    scores flag metronome bots and off-pattern accounts. Dot products and
    norms are EXACT integer sums; one float expression per user
    (dot / (sqrt(du) · sqrt(dg))), rounded half-up at 1e-6.

    Scale shape: pass 1 folds the bounded 168-bin global profile from
    per-batch partials; pass 2 ships per-batch (user, bin, n) partials
    through ONE user-bucket exchange where each bucket scores its users
    against the broadcast global — only (user, n_events, cos) rows leave."""
    import ray

    def gpart(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        how = (ts // _HOUR_US) % 168
        uu, cc = np.unique(how, return_counts=True)
        return pd.DataFrame({"how": uu.astype(np.int64), "n": cc.astype(np.int64)})

    gp = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(gpart, batch_format="pyarrow")
        .to_pandas()
        .groupby("how")["n"]
        .sum()
    )
    glob = np.zeros(168, np.int64)
    glob[gp.index.to_numpy(np.int64)] = gp.to_numpy(np.int64)
    glob_ref = ray.put(glob)

    def upart(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        how = ((ts // _HOUR_US) % 168).astype(np.int64)
        df = (
            pd.DataFrame({"u": u, "how": how})
            .groupby(["u", "how"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        df["n"] = df["n"].astype(np.int64)
        df["_b"] = (df["u"] % _SA_BUCKETS).astype(np.int64)
        return df

    def score(g: pd.DataFrame) -> pd.DataFrame:
        glob_ = ray.get(glob_ref).astype(np.float64)
        c = (
            g.groupby(["u", "how"], sort=False)["n"]
            .sum()
            .unstack(fill_value=0)
            .reindex(columns=range(168), fill_value=0)
        )
        m = c.to_numpy().astype(np.int64)
        dot = (m * glob_.astype(np.int64)).sum(axis=1).astype(np.float64)
        du = (m * m).sum(axis=1).astype(np.float64)
        dg = float((glob_ * glob_).sum())
        cos = dot / (np.sqrt(du) * np.sqrt(dg))
        return pd.DataFrame(
            {
                "user_id": c.index.to_numpy(np.int64),
                "n_events": m.sum(axis=1),
                "cos_sim": np.floor(cos * 1_000_000.0 + 0.5) / 1_000_000.0,
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(upart, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(score, batch_format="pandas")
    )


ORACLES99["events_schedule_affinity"] = f"""
WITH e AS (
  SELECT user_id, (epoch_us(ts) // {_HOUR_US}) % 168 AS how FROM events
),
up AS (
  SELECT user_id, how, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2
),
gp AS (
  SELECT how, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1
),
dg AS (SELECT CAST(sum(n * n) AS DOUBLE) AS dg FROM gp),
s AS (
  SELECT up.user_id,
         CAST(sum(up.n) AS BIGINT) AS n_events,
         CAST(sum(up.n * gp.n) AS DOUBLE) AS dot,
         CAST(sum(up.n * up.n) AS DOUBLE) AS du
  FROM up JOIN gp USING (how)
  GROUP BY 1
)
SELECT user_id, n_events,
       floor((dot / (sqrt(du) * sqrt(dg))) * 1000000.0 + 0.5) / 1000000.0
         AS cos_sim
FROM s, dg"""


QUERIES99 = {
    "orders_split_shipments": q_orders_split_shipments,
    "events_schedule_affinity": q_events_schedule_affinity,
}
