"""Driver-contract queries, wave 201 — decile gains/lift table with exact
tie-aware AUC (balance as activity-propensity score) and a sample-ratio
mismatch check over deterministic 50/50 hash bucketing (experimentation
infrastructure). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries197 import _phi_upper, _phi_upper_sql
from .queries200 import _mix64, _mix64_sql

ORACLES201: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customer_gains_auc — decile gains/lift + exact Mann-Whitney AUC
# ---------------------------------------------------------------------------


def q_customer_gains_auc(sf_dir: str):
    """Model-evaluation table for the score 'account balance predicts
    activity' (outcome = customer has ≥ 1 order): deciles by (balance DESC,
    custkey ASC), per decile n, goods, cumulative gain share and lift; AUC
    from the tie-aware Mann-Whitney count 2U = Σ_v g_v(2·bads_below + b_v)
    (exact integers) as a constant column. Output: decile, n, n_good,
    gain_micro, lift_micro, auc_micro.

    Scale shape: order-presence folds via a distinct-custkey combiner; the
    customer table is dimension-sized, so ranking/deciling runs vectorized
    on the driver — no shuffle."""
    import pyarrow.parquet as pq

    def oc_partial(t: pa.Table) -> pd.DataFrame:
        return t.select(["o_custkey"]).to_pandas().drop_duplicates()

    ocp = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(oc_partial, batch_format="pyarrow")
        .to_pandas()
    )
    active = set(ocp["o_custkey"].unique()) if not ocp.empty else set()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    cust["good"] = cust["c_custkey"].isin(active).astype(np.int64)
    cols = ["decile", "n", "n_good", "gain_micro", "lift_micro", "auc_micro"]
    if cust.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    cust = cust.sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    n = len(cust)
    g_total = int(cust["good"].sum())
    b_total = n - g_total
    decile = (np.arange(n, dtype=np.int64) * 10) // n
    cust["decile"] = decile
    per = cust.groupby("decile").agg(n=("good", "size"), n_good=("good", "sum"))
    cum_good = per["n_good"].cumsum()
    cum_n = per["n"].cumsum()
    gain = cum_good.to_numpy(np.float64) / float(g_total)
    lift = gain / (cum_n.to_numpy(np.float64) / float(n))
    # exact tie-aware 2U over distinct balances ascending
    byv = cust.groupby("c_acctbal", sort=True).agg(
        g=("good", "sum"), tot=("good", "size")
    )
    b_v = (byv["tot"] - byv["g"]).to_numpy(np.int64)
    g_v = byv["g"].to_numpy(np.int64)
    cumb_below = np.concatenate([[0], np.cumsum(b_v)[:-1]])
    u2 = int((g_v * (2 * cumb_below + b_v)).sum())
    auc = u2 / (2.0 * g_total * b_total) if g_total and b_total else 0.0
    micro = lambda a: np.floor(np.asarray(a) * 1_000_000.0 + 0.5).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "decile": np.asarray(per.index.to_numpy(np.int64)),
            "n": per["n"].to_numpy(np.int64),
            "n_good": per["n_good"].to_numpy(np.int64),
            "gain_micro": micro(gain),
            "lift_micro": micro(lift),
            "auc_micro": np.full(len(per), micro(auc), np.int64),
        }
    )


ORACLES201["customer_gains_auc"] = """
WITH act AS (SELECT DISTINCT o_custkey FROM orders),
c AS (
  SELECT c_custkey, c_acctbal,
         CASE WHEN act.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS good
  FROM customer LEFT JOIN act ON c_custkey = act.o_custkey
),
r AS (
  SELECT good, c_acctbal,
         row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) - 1 AS idx,
         count(*) OVER () AS n,
         sum(good) OVER () AS g_total
  FROM c
),
dec AS (
  SELECT (idx * 10) // n AS decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(good) AS BIGINT) AS n_good,
         any_value(r.n) AS nn, any_value(g_total) AS gt
  FROM r GROUP BY 1
),
cum AS (
  SELECT decile, n, n_good, nn, gt,
         sum(n_good) OVER (ORDER BY decile) AS cg,
         sum(n) OVER (ORDER BY decile) AS cn
  FROM dec
),
byv AS (
  SELECT c_acctbal, sum(good) AS g, count(*) - sum(good) AS b
  FROM c GROUP BY 1
),
uu0 AS (
  SELECT g, b,
         coalesce(sum(b) OVER (ORDER BY c_acctbal
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM byv
),
uu AS (SELECT sum(g * (2 * cumb + b)) AS u2 FROM uu0),
tot AS (
  SELECT any_value(gt) AS gt, any_value(nn) - any_value(gt) AS bt FROM dec
)
SELECT CAST(cum.decile AS BIGINT) AS decile, cum.n, cum.n_good,
       CAST(floor(CAST(cg AS DOUBLE) / cum.gt * 1000000.0 + 0.5) AS BIGINT)
         AS gain_micro,
       CAST(floor((CAST(cg AS DOUBLE) / cum.gt) / (CAST(cn AS DOUBLE) / cum.nn)
                  * 1000000.0 + 0.5) AS BIGINT) AS lift_micro,
       CAST(CASE WHEN tot.gt = 0 OR tot.bt = 0 THEN 0
                 ELSE floor(CAST(uu.u2 AS DOUBLE) / (2.0 * tot.gt * tot.bt)
                            * 1000000.0 + 0.5) END AS BIGINT) AS auc_micro
FROM cum, uu, tot ORDER BY decile"""


# ---------------------------------------------------------------------------
# events_srm_check — sample-ratio mismatch over 50/50 hash buckets
# ---------------------------------------------------------------------------


def q_events_srm_check(sf_dir: str):
    """Per event type: deterministic 50/50 experiment bucketing (mix64(user)
    % 2) over distinct users, the SRM chi-square (n₀−n₁)²/(n₀+n₁), its
    approximate p-value 2(1−Φ(√χ²)) (A&S 26.2.17) and the mismatch flag
    χ² > 3.84 (α = 0.05). Output: event_type, n0, n1, chi2_micro, p_micro,
    srm_flag.

    Scale shape: per-batch distinct (type, user) → ONE user-bucket exchange
    for global distinct → per-bucket (type, bucket, n) counts; driver folds
    |types|×2×buckets rows."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id"]).to_pandas().drop_duplicates()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        arm = (_mix64(d["user_id"].to_numpy(np.int64)) % np.uint64(2)).astype(
            np.int64
        )
        out = pd.DataFrame({"event_type": d["event_type"].to_numpy(object), "arm": arm, "n": 1})
        return out.groupby(["event_type", "arm"], sort=False, as_index=False).sum().astype(
            {"n": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["event_type", "n0", "n1", "chi2_micro", "p_micro", "srm_flag"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
             for c in cols}
        )
    g = part.groupby(["event_type", "arm"])["n"].sum()
    rows = []
    for et in sorted(g.index.get_level_values(0).unique()):
        sub = g.loc[et]
        n0 = int(sub.get(0, 0))
        n1 = int(sub.get(1, 0))
        if n0 + n1 == 0:
            continue
        chi2 = (n0 - n1) * (n0 - n1) / float(n0 + n1)
        p = 2.0 * float(_phi_upper(np.array([np.sqrt(chi2)]))[0])
        rows.append(
            (
                et, np.int64(n0), np.int64(n1),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(p * 1_000_000.0 + 0.5)),
                np.int64(1 if chi2 > 3.84 else 0),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES201["events_srm_check"] = f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
a AS (
  SELECT event_type, {_mix64_sql('user_id')} % 2 AS arm FROM d
),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM a GROUP BY 1 HAVING count(*) > 0
),
x AS (
  SELECT event_type, n0, n1,
         (n0 - n1) * (n0 - n1) / CAST(n0 + n1 AS DOUBLE) AS chi2
  FROM g
)
SELECT event_type, n0, n1,
       CAST(floor(chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(2.0 * {_phi_upper_sql('sqrt(chi2)')} * 1000000.0 + 0.5)
            AS BIGINT) AS p_micro,
       CAST(CASE WHEN chi2 > 3.84 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM x ORDER BY event_type"""


QUERIES201 = {
    "customer_gains_auc": q_customer_gains_auc,
    "events_srm_check": q_events_srm_check,
}
