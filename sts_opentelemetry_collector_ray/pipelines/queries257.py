"""Driver-contract queries, wave 257 — the two-sample log-rank test table
(Mantel 1966) over user activity-lifetime survival with 7-day
right-censoring, and nDCG@100 (Järvelin & Kekäläinen 2002) of the
balance-ranked customer list against urgent-order-count graded relevance.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES257: dict[str, str] = {}

_LR_USER_BUCKETS = 32
_LR_HORIZON_DAYS = 30
_NDCG_K = 100
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_logrank — two-sample log-rank table over activity lifetimes
# ---------------------------------------------------------------------------


def q_events_logrank(sf_dir: str):
    """Log-rank (Mantel–Cox) per-time table comparing the view→purchase
    conversion survival of even vs odd user ids. Per user: duration = whole
    days from first 'view' to the first purchase at-or-after it,
    right-censored at 30 days — the SAME lifetime definition as
    `events_km_survival` (queries46.py), which guarantees both deaths and
    censorings on this corpus (an activity-lifetime definition was
    degenerate: every user is active in the final week). At each duration
    t with any death: risk sets n1,n2 (T ≥ t — censored rows leave AFTER
    deaths at equal times, the standard convention), deaths d1,d2, the
    hypergeometric expectation e1 = d·n1/n and variance
    v = d·(n1/n)·(n2/n)·((n−d)/(n−1)) — both as single fixed-shape float
    expressions so the SQL replay is bit-exact.

    Scale shape: per-batch per-user view-min partials + raw purchases →
    ONE user-bucket exchange → per-user fold → bounded (t,g,ev) histogram
    to the driver; the grid scan is over distinct durations only."""
    path = f"{sf_dir}/events.parquet"
    H = _LR_HORIZON_DAYS

    def partial(t: pa.Table) -> pa.Table:
        # views reduce to a per-user min (min of mins is exact); purchases
        # ship UNREDUCED — a per-batch purchase min could mask a later
        # purchase that is the first one ≥ the GLOBAL first view
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "tu": tu, "et": et})
        views = df[df["et"] == "view"].groupby("user_id")["tu"].min()
        pur = df[df["et"] == "purchase"]
        res = pd.DataFrame(
            {
                "user_id": np.concatenate(
                    [views.index.to_numpy(), pur["user_id"].to_numpy()]
                ).astype(np.int64),
                "tu": np.concatenate(
                    [views.to_numpy(), pur["tu"].to_numpy()]
                ).astype(np.int64),
                "kind": np.concatenate(
                    [np.zeros(len(views), np.int8), np.ones(len(pur), np.int8)]
                ),
            }
        )
        res["_b"] = (res["user_id"].to_numpy() % _LR_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(res, preserve_index=False).replace_schema_metadata(
            None
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["kind"] == 0].groupby("user_id")["tu"].min()
        users = pd.DataFrame({"user_id": v.index.to_numpy(), "tv": v.to_numpy()})
        p = g[g["kind"] == 1][["user_id", "tu"]].merge(users, on="user_id")
        p = p[p["tu"] >= p["tv"]]
        tp = p.groupby("user_id")["tu"].min()
        users["tp"] = users["user_id"].map(tp)
        dur_days = (users["tp"].to_numpy() - users["tv"].to_numpy()) // _DAY_US
        has_event = users["tp"].notna().to_numpy() & (dur_days <= H)
        t = np.where(has_event, dur_days, H).astype(np.int64)
        ev = has_event.astype(np.int64)
        grp = (users["user_id"].to_numpy() % 2).astype(np.int64)
        hist = (
            pd.DataFrame({"t": t, "g": grp, "ev": ev})
            .groupby(["t", "g", "ev"])
            .size()
            .rename("cnt")
            .reset_index()
        )
        hist["cnt"] = hist["cnt"].astype(np.int64)
        return hist

    cols = ["t_day", "n1_risk", "n2_risk", "d1", "d2", "e1_micro", "v_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    hist = (
        ray.data.read_parquet(path, columns=["ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: fold(g.drop(columns=["_b"])), batch_format="pandas")
        .to_pandas()  # bounded: ≤ (H+1)·4 rows per bucket
        .groupby(["t", "g", "ev"])["cnt"]
        .sum()
        .reset_index()
    )
    if hist.empty:
        return empty
    piv = (
        hist.pivot_table(
            index="t", columns=["g", "ev"], values="cnt", aggfunc="sum", fill_value=0
        )
        .reindex(columns=pd.MultiIndex.from_product([[0, 1], [0, 1]]), fill_value=0)
        .sort_index()
    )
    d1 = piv[(0, 1)].to_numpy(np.int64)
    d2 = piv[(1, 1)].to_numpy(np.int64)
    l1 = d1 + piv[(0, 0)].to_numpy(np.int64)
    l2 = d2 + piv[(1, 0)].to_numpy(np.int64)
    n1tot, n2tot = int(l1.sum()), int(l2.sum())
    n1 = n1tot - np.concatenate([[0], np.cumsum(l1)[:-1]])
    n2 = n2tot - np.concatenate([[0], np.cumsum(l2)[:-1]])
    d = d1 + d2
    n = n1 + n2
    keep = d > 0
    t_day = piv.index.to_numpy(np.int64)[keep]
    n1, n2, d1, d2, d, n = n1[keep], n2[keep], d1[keep], d2[keep], d[keep], n[keep]
    e1 = (d * n1).astype(np.float64) / n.astype(np.float64)
    a = n1.astype(np.float64) / n.astype(np.float64)
    b = n2.astype(np.float64) / n.astype(np.float64)
    c = (n - d).astype(np.float64) / np.maximum(n - 1, 1).astype(np.float64)
    v = np.where(n > 1, ((d.astype(np.float64) * a) * b) * c, 0.0)
    return pd.DataFrame(
        {
            "t_day": t_day,
            "n1_risk": n1.astype(np.int64),
            "n2_risk": n2.astype(np.int64),
            "d1": d1,
            "d2": d2,
            "e1_micro": np.floor(e1 * 1_000_000.0 + 0.5).astype(np.int64),
            "v_micro": np.floor(v * 1_000_000.0 + 0.5).astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES257["events_logrank"] = f"""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS tp
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.tv
  GROUP BY e.user_id
),
dur AS (
  SELECT CASE WHEN p.tp IS NOT NULL
                   AND (p.tp - v.tv) // {_DAY_US} <= {_LR_HORIZON_DAYS}
              THEN (p.tp - v.tv) // {_DAY_US}
              ELSE {_LR_HORIZON_DAYS} END AS t,
         v.user_id % 2 AS g,
         CASE WHEN p.tp IS NOT NULL
                   AND (p.tp - v.tv) // {_DAY_US} <= {_LR_HORIZON_DAYS}
              THEN 1 ELSE 0 END AS ev
  FROM v LEFT JOIN p USING (user_id)
),
hist AS (
  SELECT t,
         CAST(sum(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d2,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l2
  FROM dur GROUP BY t
),
tot AS (
  SELECT CAST(sum(l1) AS BIGINT) AS n1tot, CAST(sum(l2) AS BIGINT) AS n2tot
  FROM hist
),
risk AS (
  SELECT t, d1, d2,
         (SELECT n1tot FROM tot)
           - CAST(coalesce(sum(l1) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n1,
         (SELECT n2tot FROM tot)
           - CAST(coalesce(sum(l2) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n2
  FROM hist
)
SELECT t AS t_day, n1 AS n1_risk, n2 AS n2_risk, d1, d2,
       CAST(floor((CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS e1_micro,
       CAST(floor(CASE WHEN n1 + n2 > 1 THEN
              ((CAST(d1 + d2 AS DOUBLE)
                * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))
               * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))
              * (CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
                 / CAST((n1 + n2) - 1 AS DOUBLE))
            ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT) AS v_micro
FROM risk WHERE d1 + d2 > 0 ORDER BY t"""


# ---------------------------------------------------------------------------
# customer_ndcg — nDCG@100 of the balance-ranked urgent-count relevance
# ---------------------------------------------------------------------------


def q_customer_ndcg(sf_dir: str):
    """nDCG@100 of ranking customers by account balance (DESC, custkey ASC
    tie-break) with graded relevance gain(c) = number of 1-URGENT orders
    placed by c. DCG = Σ gain_i / log2(i+1) over the top-100 ranks; IDCG
    the same weights over the 100 largest gains corpus-wide (equal gains
    commute, so the ideal order is well-defined). Both sides fold the ≤100
    terms SEQUENTIALLY in rank order (Python loop here, `list_reduce` in
    SQL) so the float sum replays bit-for-bit. One row: k, n, dcg_micro,
    idcg_micro, ndcg_micro.

    Scale shape: urgent counts are a |urgent-customers|-bounded partial;
    the two top-100s merge per-batch local top-k partials — rows never
    leave their blocks."""
    k = _NDCG_K

    cnt = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .map_batches(
            lambda t: (
                t.to_pandas()
                .loc[lambda d: d["o_orderpriority"] == "1-URGENT"]
                .groupby("o_custkey", as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    gains_by_key = (
        cnt.groupby("o_custkey")["cnt"].sum() if not cnt.empty else pd.Series(dtype=np.int64)
    )
    gmap = {int(kk): int(vv) for kk, vv in gains_by_key.items()}

    def cust_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        if df.empty:
            return pd.DataFrame(
                {"c_custkey": pd.Series([], dtype=np.int64),
                 "c_acctbal": pd.Series([], dtype=np.float64),
                 "gain": pd.Series([], dtype=np.int64)}
            )
        df = df.copy()
        df["gain"] = (
            df["c_custkey"].map(gmap).fillna(0).astype(np.int64)
        )
        top_bal = df.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        top_gain = df.sort_values("gain", ascending=False, kind="mergesort").head(k)
        out = pd.concat([top_bal, top_gain]).drop_duplicates("c_custkey")
        return out[["c_custkey", "c_acctbal", "gain"]].reset_index(drop=True)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
        )
        .map_batches(cust_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["k", "n", "dcg_micro", "idcg_micro", "ndcg_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    n_total = int(
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .count()
    )
    dedup = part.drop_duplicates("c_custkey")
    top_bal = dedup.sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    ideal_gains = np.sort(dedup["gain"].to_numpy(np.int64))[::-1][:k]
    ideal_len = min(k, n_total)
    if len(ideal_gains) < ideal_len:
        ideal_gains = np.concatenate(
            [ideal_gains, np.zeros(ideal_len - len(ideal_gains), np.int64)]
        )
    else:
        ideal_gains = ideal_gains[:ideal_len]
    dcg = 0.0
    for i, g in enumerate(top_bal["gain"].to_numpy(np.int64), start=1):
        dcg = dcg + float(g) / np.log2(float(i + 1))
    idcg = 0.0
    for i, g in enumerate(ideal_gains, start=1):
        idcg = idcg + float(g) / np.log2(float(i + 1))
    if idcg <= 0.0:
        return empty
    ndcg = dcg / idcg
    return pd.DataFrame(
        {
            "k": [np.int64(k)],
            "n": [np.int64(n_total)],
            "dcg_micro": [np.int64(np.floor(dcg * 1_000_000.0 + 0.5))],
            "idcg_micro": [np.int64(np.floor(idcg * 1_000_000.0 + 0.5))],
            "ndcg_micro": [np.int64(np.floor(ndcg * 1_000_000.0 + 0.5))],
        }
    )


ORACLES257["customer_ndcg"] = f"""
WITH g AS (
  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS gain
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
),
ranked AS (
  SELECT coalesce(g.gain, 0) AS gain,
         row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS i
  FROM customer LEFT JOIN g ON customer.c_custkey = g.ck
),
topk AS (SELECT gain, i FROM ranked WHERE i <= {_NDCG_K}),
ideal AS (
  SELECT gain, row_number() OVER (ORDER BY gain DESC) AS i
  FROM (SELECT gain FROM ranked ORDER BY gain DESC LIMIT {_NDCG_K})
),
dcg AS (
  SELECT list_reduce(
           list_prepend(0.0,
             (SELECT coalesce(list(CAST(gain AS DOUBLE) / log2(i + 1.0)
                                   ORDER BY i), [])
              FROM topk)),
           (acc, x) -> acc + x) AS v
),
idcg AS (
  SELECT list_reduce(
           list_prepend(0.0,
             (SELECT coalesce(list(CAST(gain AS DOUBLE) / log2(i + 1.0)
                                   ORDER BY i), [])
              FROM ideal)),
           (acc, x) -> acc + x) AS v
)
SELECT CAST({_NDCG_K} AS BIGINT) AS k,
       CAST((SELECT count(*) FROM customer) AS BIGINT) AS n,
       CAST(floor(dcg.v * 1000000.0 + 0.5) AS BIGINT) AS dcg_micro,
       CAST(floor(idcg.v * 1000000.0 + 0.5) AS BIGINT) AS idcg_micro,
       CAST(floor(dcg.v / idcg.v * 1000000.0 + 0.5) AS BIGINT) AS ndcg_micro
FROM dcg, idcg WHERE idcg.v > 0"""


QUERIES257 = {
    "events_logrank": q_events_logrank,
    "customer_ndcg": q_customer_ndcg,
}
