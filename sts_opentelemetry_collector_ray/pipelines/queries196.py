"""Driver-contract queries, wave 196 — priority sampling (Duffield, Lund &
Thorup 2007: deterministic hash priorities, tau-threshold estimator) audited
against exact per-type totals, and nearest-neighbor covariate matching with
an ATT estimate (balance-matched controls within nation).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES196: dict[str, str] = {}

_PS_K = 64
_PS_BUCKETS = 64
_P1 = 0x9E3779B97F4A7C15
_P2 = 0xBF58476D1CE4E5B9
_TWO64 = 18446744073709551616


def _mix64(uid: np.ndarray) -> np.ndarray:
    """xorshift-mixed multiplicative hash (same shape as wave-192's HRW
    weight; SQL replays it in INT128-safe 32-bit pieces)."""
    with np.errstate(over="ignore"):
        h = (uid.astype(np.uint64) ^ np.uint64(_P2)) * np.uint64(_P1)
        return h ^ (h >> np.uint64(33))


def _mix64_sql(col: str) -> str:
    bh, bl = _P1 >> 32, _P1 & 0xFFFFFFFF
    u = f"xor(CAST({col} AS HUGEINT), CAST({_P2} AS HUGEINT))"
    h = (
        f"((({u} * {bl}) % {_TWO64}"
        f" + (({u} * {bh}) % 4294967296) * 4294967296) % {_TWO64})"
    )
    return f"xor({h}, {h} // 8589934592)"


# ---------------------------------------------------------------------------
# events_priority_sample — tau-threshold subset-sum estimation audit
# ---------------------------------------------------------------------------


def q_events_priority_sample(sf_dir: str):
    """Per event type, items = users weighted by their event count. Priority
    q_i = w_i / u_i with u_i = (mix64(user)+1)/2⁶⁴; keep the k = 64 highest
    priorities, τ = the (k+1)-th; the estimator Σ max(w_i, τ) over the sample
    is unbiased for the total (Duffield-Lund-Thorup). Output: event_type,
    n_items, total_w, est_w, err_micro.

    Scale shape: per-batch (type, user, n) combiner → ONE user-bucket
    exchange (global per-item weights exact per bucket) → per-bucket local
    top-(k+1) by priority + a totals row; driver folds buckets × (k+2) rows
    per type."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id"]).to_pandas()
        df["n"] = 1
        g = df.groupby(["event_type", "user_id"], sort=False, as_index=False)[
            "n"
        ].sum()
        g["_b"] = (g["user_id"].to_numpy(np.int64) % _PS_BUCKETS).astype(np.int32)
        return g.astype({"n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby(["event_type", "user_id"], as_index=False)["n"].sum()
        u = (_mix64(w["user_id"].to_numpy(np.int64)).astype(np.float64) + 1.0) / float(
            _TWO64
        )
        w["q"] = w["n"].to_numpy(np.float64) / u
        outs = []
        for et, sub in w.groupby("event_type", sort=False):
            top = sub.sort_values(
                ["q", "user_id"], ascending=[False, True], kind="mergesort"
            ).head(_PS_K + 1)
            tot = pd.DataFrame(
                {
                    "event_type": [et],
                    "user_id": [np.int64(-1)],
                    "n": [np.int64(sub["n"].sum())],
                    "q": [np.float64(len(sub))],  # item count rides q
                }
            )
            outs.append(pd.concat([top[["event_type", "user_id", "n", "q"]], tot]))
        return pd.concat(outs, ignore_index=True).astype(
            {"user_id": np.int64, "n": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["event_type", "n_items", "total_w", "est_w", "err_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    rows = []
    for et, sub in part.groupby("event_type", sort=True):
        tot_rows = sub[sub["user_id"] == -1]
        total_w = int(tot_rows["n"].sum())
        n_items = int(tot_rows["q"].sum())
        cand = sub[sub["user_id"] != -1].sort_values(
            ["q", "user_id"], ascending=[False, True], kind="mergesort"
        )
        top = cand.head(_PS_K)
        if len(cand) > _PS_K:
            tau = float(cand["q"].iloc[_PS_K])
            est = float(np.maximum(top["n"].to_numpy(np.float64), tau).sum())
        else:
            est = float(top["n"].sum())
        err = np.floor(abs(est - total_w) / float(total_w) * 1_000_000.0 + 0.5)
        rows.append(
            (et, np.int64(n_items), np.int64(total_w),
             np.int64(np.floor(est + 0.5)), np.int64(err))
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES196["events_priority_sample"] = f"""
WITH w AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pr AS (
  SELECT event_type, user_id, n,
         CAST(n AS DOUBLE)
           / ((CAST({_mix64_sql('user_id')} AS DOUBLE) + 1.0) / {_TWO64}.0) AS q
  FROM w
),
r AS (
  SELECT event_type, user_id, n, q,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY q DESC, user_id ASC) AS rk
  FROM pr
),
tau AS (
  SELECT event_type, max(CASE WHEN rk = {_PS_K + 1} THEN q END) AS tau
  FROM r GROUP BY 1
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(n) AS BIGINT) AS total_w
  FROM w GROUP BY 1
),
est AS (
  SELECT r.event_type,
         sum(CASE WHEN tau.tau IS NULL THEN CAST(r.n AS DOUBLE)
                  ELSE greatest(CAST(r.n AS DOUBLE), tau.tau) END) AS est
  FROM r JOIN tau ON r.event_type = tau.event_type
  WHERE r.rk <= {_PS_K} GROUP BY 1
)
SELECT tot.event_type, tot.n_items, tot.total_w,
       CAST(floor(est.est + 0.5) AS BIGINT) AS est_w,
       CAST(floor(abs(est.est - tot.total_w) / CAST(tot.total_w AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS err_micro
FROM tot JOIN est ON tot.event_type = est.event_type
ORDER BY tot.event_type"""


# ---------------------------------------------------------------------------
# customer_nn_matching — nearest-neighbor covariate matching ATT
# ---------------------------------------------------------------------------


def q_customer_nn_matching(sf_dir: str):
    """Nearest-neighbor matching (one control with replacement): treated =
    BUILDING-segment customers, controls = all others, matched within nation
    on account balance (nearest |Δbal|; distance ties → lowest control
    custkey). Outcome = the customer's order count. Output one row:
    n_matched, att_micro (mean treated − control outcome) and
    mean_dist_micro.

    Scale shape: order counts fold via a (custkey, n) combiner (customer is
    a dimension table); matching is vectorized searchsorted against the
    per-nation sorted control balances with equal-balance min-custkey runs —
    no shuffle."""
    import pyarrow.parquet as pq

    def oc_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey"]).to_pandas()
        df["n"] = 1
        return df.groupby("o_custkey", sort=False, as_index=False)["n"].sum().astype(
            {"n": np.int64}
        )

    ocp = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(oc_partial, batch_format="pyarrow")
        .to_pandas()
    )
    oc = (
        ocp.groupby("o_custkey")["n"].sum()
        if not ocp.empty
        else pd.Series(dtype=np.int64)
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).to_pandas()
    cust["y"] = (
        oc.reindex(cust["c_custkey"].to_numpy()).fillna(0).to_numpy(np.int64)
    )
    treated = cust[cust["c_mktsegment"] == "BUILDING"]
    controls = cust[cust["c_mktsegment"] != "BUILDING"]
    cols = ["n_matched", "att_micro", "mean_dist_micro"]
    diffs, dists = [], []
    for nk, tr in treated.groupby("c_nationkey", sort=True):
        co = controls[controls["c_nationkey"] == nk]
        if co.empty:
            continue
        co = co.sort_values(["c_acctbal", "c_custkey"], kind="mergesort")
        ub, uidx = np.unique(co["c_acctbal"].to_numpy(np.float64), return_index=True)
        # first row of each equal-balance run = min custkey (sorted above)
        ukey = co["c_custkey"].to_numpy(np.int64)[uidx]
        uy = co["y"].to_numpy(np.int64)[uidx]
        tb = tr["c_acctbal"].to_numpy(np.float64)
        pos = np.searchsorted(ub, tb, side="left")
        li = np.clip(pos - 1, 0, len(ub) - 1)
        ri = np.clip(pos, 0, len(ub) - 1)
        dl = np.abs(tb - ub[li])
        dr = np.abs(ub[ri] - tb)
        has_l, has_r = pos > 0, pos < len(ub)
        dl = np.where(has_l, dl, np.inf)
        dr = np.where(has_r, dr, np.inf)
        use_l = (dl < dr) | ((dl == dr) & (ukey[li] < ukey[ri]))
        sel = np.where(use_l, li, ri)
        d = np.minimum(dl, dr)
        diffs.append(tr["y"].to_numpy(np.int64) - uy[sel])
        dists.append(d)
    if not diffs:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    diff = np.concatenate(diffs)
    dist = np.concatenate(dists)
    n = len(diff)
    att = float(diff.sum()) / n
    md = float(dist.sum()) / n
    return pd.DataFrame(
        {
            "n_matched": np.array([n], np.int64),
            "att_micro": np.array(
                [np.floor(att * 1_000_000.0 + 0.5)], np.int64
            ),
            "mean_dist_micro": np.array(
                [np.floor(md * 1_000_000.0 + 0.5)], np.int64
            ),
        }
    )


ORACLES196["customer_nn_matching"] = """
WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
cust AS (
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
         coalesce(oc.n, 0) AS y
  FROM customer LEFT JOIN oc ON c_custkey = oc.o_custkey
),
t AS (SELECT * FROM cust WHERE c_mktsegment = 'BUILDING'),
c AS (SELECT * FROM cust WHERE c_mktsegment <> 'BUILDING'),
m AS (
  SELECT t.c_custkey, t.y AS yt, c.y AS yc,
         abs(t.c_acctbal - c.c_acctbal) AS d,
         row_number() OVER (PARTITION BY t.c_custkey
                            ORDER BY abs(t.c_acctbal - c.c_acctbal) ASC,
                                     c.c_custkey ASC) AS r
  FROM t JOIN c ON t.c_nationkey = c.c_nationkey
)
SELECT CAST(count(*) AS BIGINT) AS n_matched,
       CAST(floor(CAST(sum(yt - yc) AS DOUBLE) / count(*)
                  * 1000000.0 + 0.5) AS BIGINT) AS att_micro,
       CAST(floor(sum(d) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS mean_dist_micro
FROM m WHERE r = 1"""


QUERIES196 = {
    "events_priority_sample": q_events_priority_sample,
    "customer_nn_matching": q_customer_nn_matching,
}
