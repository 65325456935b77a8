"""Driver-contract queries, wave 256 — Cronbach's α internal-consistency
coefficient (1951) treating the 24 hour-of-day counts as items and days
as cases (EXACT integer moment algebra: n·Σx² − (Σx)² per item, one final
division) and the average-precision (area under the precision-recall
steps) of the balance-ranked urgent-customer classifier — the ranking
metric of a retrieval/filter audit.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES256: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_cronbach_alpha — hour-of-day items, days as cases
# ---------------------------------------------------------------------------


def q_events_cronbach_alpha(sf_dir: str):
    """Cronbach's α with the 24 hour-of-day counts as items and days as
    cases: α = k/(k−1)·(1 − ΣVⱼ/V_tot) with the scaled population
    variances Vⱼ = n·Σxⱼ² − (Σxⱼ)² (EXACT integers — absent (day,hour)
    cells are zeros and cancel from both sums), V_tot the same on daily
    totals, k = 24, n = distinct days. One row: n_days, k_items, sv, vt,
    alpha_micro.

    Scale shape: per-batch (day, hour) count partials; the item algebra
    folds a ≤ |days|×24 table to two integers on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["ts"]).to_pandas()
        d = df["ts"].dt
        out = pd.DataFrame(
            {"day": (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64),
             "hour": d.hour.astype(np.int64)}
        )
        return (
            out.groupby(["day", "hour"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_days", "k_items", "sv", "vt", "alpha_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    dh = part.groupby(["day", "hour"], as_index=False)["c"].sum()
    n = int(dh["day"].nunique())
    if n < 2:
        return empty
    c = dh["c"].to_numpy(np.int64)
    per_item = dh.assign(c2=c * c).groupby("hour").agg(
        s=("c", "sum"), s2=("c2", "sum")
    )
    sv = int((n * per_item["s2"] - per_item["s"] ** 2).sum())
    tot = dh.groupby("day")["c"].sum()
    t = tot.to_numpy(np.int64)
    vt = int(n * (t * t).sum() - int(t.sum()) ** 2)
    if vt == 0:
        return empty
    k = 24
    alpha = (k / (k - 1.0)) * (1.0 - float(sv) / float(vt))
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)], "k_items": [np.int64(k)],
            "sv": [np.int64(sv)], "vt": [np.int64(vt)],
            "alpha_micro": [np.int64(np.floor(alpha * 1_000_000.0 + 0.5))],
        }
    )


ORACLES256["events_cronbach_alpha"] = """
WITH dh AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)
           AS day,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n FROM dh),
items AS (
  SELECT hour, sum(c) AS s, sum(c * c) AS s2 FROM dh GROUP BY 1
),
svv AS (
  SELECT CAST(sum(nd.n * items.s2 - items.s * items.s) AS BIGINT) AS sv
  FROM items, nd
),
tots AS (SELECT day, sum(c) AS t FROM dh GROUP BY 1),
vtt AS (
  SELECT CAST(any_value(nd.n) * sum(t * t) - sum(t) * sum(t) AS BIGINT)
           AS vt
  FROM tots, nd
)
SELECT nd.n AS n_days, CAST(24 AS BIGINT) AS k_items, svv.sv, vtt.vt,
       CAST(floor((24.0 / 23.0)
                  * (1.0 - CAST(svv.sv AS DOUBLE) / CAST(vtt.vt AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro
FROM nd, svv, vtt WHERE nd.n >= 2 AND vtt.vt <> 0"""


# ---------------------------------------------------------------------------
# customer_average_precision — AP of the balance-ranked urgent classifier
# ---------------------------------------------------------------------------


def q_customer_average_precision(sf_dir: str):
    """Average precision of ranking customers by account balance (DESC,
    custkey ASC tie-break) against the label "placed ≥ 1 URGENT-priority
    order": AP = (1/P)·Σ_{ranks k with a positive} precision@k — the
    step-integral of the PR curve; also the positive base rate (the AP of
    a random ranking). One row: n, n_pos, ap_micro, base_micro.

    Scale shape: broadcastable label semi-join (urgent custkeys), one
    rank scan over the bounded customer table on the driver (at 100 TB:
    sort by balance + a prefix-sum pass)."""
    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
        )
        .to_pandas()
    )
    urgent = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        .map_batches(
            lambda t: pd.DataFrame(
                {"o_custkey": pd.unique(
                    t.to_pandas().loc[
                        lambda d: d["o_orderpriority"] == "1-URGENT",
                        "o_custkey",
                    ]
                )}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["n", "n_pos", "ap_micro", "base_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cust.empty:
        return empty
    pos_keys = set(urgent["o_custkey"].unique().tolist())
    cust = cust.sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True],
        kind="mergesort",
    )
    y = cust["c_custkey"].isin(pos_keys).to_numpy(bool)
    n = len(y)
    p = int(y.sum())
    if p == 0:
        return empty
    cum = np.cumsum(y.astype(np.int64))
    k = np.arange(1, n + 1, dtype=np.int64)
    ap = float((cum[y].astype(np.float64) / k[y].astype(np.float64)).sum()) / p
    base = p / float(n)
    return pd.DataFrame(
        {
            "n": [np.int64(n)], "n_pos": [np.int64(p)],
            "ap_micro": [np.int64(np.floor(ap * 1_000_000.0 + 0.5))],
            "base_micro": [np.int64(np.floor(base * 1_000_000.0 + 0.5))],
        }
    )


ORACLES256["customer_average_precision"] = """
WITH pos AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
ranked AS (
  SELECT CASE WHEN pos.o_custkey IS NULL THEN 0 ELSE 1 END AS y,
         row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS k
  FROM customer LEFT JOIN pos ON customer.c_custkey = pos.o_custkey
),
scan AS (
  SELECT y, k,
         sum(y) OVER (ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM ranked
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
  FROM ranked
)
SELECT tot.n, tot.p AS n_pos,
       CAST(floor(sum(CASE WHEN y = 1
                           THEN CAST(cum AS DOUBLE) / k ELSE 0 END)
                  / tot.p * 1000000.0 + 0.5) AS BIGINT) AS ap_micro,
       CAST(floor(tot.p / CAST(tot.n AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS base_micro
FROM scan, tot GROUP BY tot.n, tot.p HAVING tot.p > 0"""


QUERIES256 = {
    "events_cronbach_alpha": q_events_cronbach_alpha,
    "customer_average_precision": q_customer_average_precision,
}
