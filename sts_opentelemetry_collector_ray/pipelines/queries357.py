"""Driver-contract queries, wave 357 — the Markov order test (does the
second-to-last event add predictive information beyond the last?) and
the per-customer spend-trend census (growing / flat / declining
spenders). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES357: dict[str, str] = {}

_MO_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_markov_order_test — conditional entropy at order 1 vs 2
# ---------------------------------------------------------------------------


def q_events_markov_order_test(sf_dir: str):
    """Memory depth: from per-user consecutive type triples
    (t1, t2, t3), the conditional entropies H(X|prev) (over pair
    counts) and H(X|prev2) (over triple counts), both computed on the
    SAME triple population (pairs = (t2, t3) of each triple). The gap
    H1 - H2 >= 0 is the extra information in the second-order context.
    Counts exact, logs float. One row: n_triples, h1_micro, h2_micro,
    gap_micro.

    Scale shape: user-bucket exchange; per-bucket shifted triples fold
    into the bounded |types|^3 cube."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % _MO_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "t1": pd.Series([], dtype=object),
                "t2": pd.Series([], dtype=object),
                "t3": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        et = g["et"].to_numpy(object)
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        t1, t2, t3 = et[:-2][same], et[1:-1][same], et[2:][same]
        if len(t1) == 0:
            return zero
        out = (
            pd.DataFrame({"t1": t1, "t2": t2, "t3": t3})
            .groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    cube = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["t1", "t2", "t3"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_triples", "h1_micro", "h2_micro", "gap_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cube.empty:
        return empty
    n = int(cube["c"].sum())

    def cond_ent(joint_keys: list[str], ctx_keys: list[str]) -> float:
        joint = cube.groupby(joint_keys)["c"].sum()
        ctx = cube.groupby(ctx_keys)["c"].sum()
        # H(X | ctx) = (1/N) [sum ctx c ln c_ctx - sum joint c ln c_joint]
        sj = float(
            (joint.to_numpy(np.int64).astype(np.float64)
             * np.log(joint.to_numpy(np.int64).astype(np.float64))).sum()
        )
        sc = float(
            (ctx.to_numpy(np.int64).astype(np.float64)
             * np.log(ctx.to_numpy(np.int64).astype(np.float64))).sum()
        )
        return (sc - sj) / float(n)

    h1 = cond_ent(["t2", "t3"], ["t2"])
    h2 = cond_ent(["t1", "t2", "t3"], ["t1", "t2"])
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(h1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(h2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor((h1 - h2) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES357["events_markov_order_test"] = """
WITH seq AS (
  SELECT event_type AS t3,
         lag(event_type, 1) OVER w AS t2,
         lag(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tri),
j23 AS (SELECT t2, t3, CAST(sum(c) AS BIGINT) AS c FROM tri GROUP BY 1, 2),
c2 AS (SELECT t2, CAST(sum(c) AS BIGINT) AS c FROM tri GROUP BY 1),
c12 AS (SELECT t1, t2, CAST(sum(c) AS BIGINT) AS c FROM tri GROUP BY 1, 2),
h AS (
  SELECT
    ((SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM c2)
     - (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM j23))
      / nn.n AS h1,
    ((SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM c12)
     - (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM tri))
      / nn.n AS h2,
    nn.n
  FROM nn
)
SELECT n AS n_triples,
       CAST(floor(h1 * 1000000.0 + 0.5) AS BIGINT) AS h1_micro,
       CAST(floor(h2 * 1000000.0 + 0.5) AS BIGINT) AS h2_micro,
       CAST(floor((h1 - h2) * 1000000.0 + 0.5) AS BIGINT) AS gap_micro
FROM h
WHERE n > 0"""


# ---------------------------------------------------------------------------
# customer_spend_trend_census — growing vs declining spenders
# ---------------------------------------------------------------------------


def q_customer_spend_trend_census(sf_dir: str):
    """Spend trajectory: per customer with >= 3 orders, the OLS slope
    of order cents on the order sequence index (0-based by date,
    orderkey ties); classified by the EXACT integer sign of the slope
    numerator n*Sxy - Sx*Sy (growing / flat / declining). Per class:
    trend, n_customers, share_micro.

    Scale shape: per-customer ordered folds inside ONE custkey-bucket
    exchange; each bucket emits a 3-cell census."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "k": df["o_custkey"].to_numpy(np.int64),
                "dy": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ),
                "ok": df["o_orderkey"].to_numpy(np.int64),
                "cents": np.floor(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        out["_b"] = (out["k"] % _MO_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "trend": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["k", "dy", "ok"], kind="stable")
        counts = {"growing": 0, "flat": 0, "declining": 0}
        for _, sub in g.groupby("k", sort=False):
            m = len(sub)
            if m < 3:
                continue
            y = sub["cents"].to_numpy(np.int64).astype(object)
            x = np.arange(m, dtype=object)
            num = m * int((x * y).sum()) - int(x.sum()) * int(y.sum())
            if num > 0:
                counts["growing"] += 1
            elif num < 0:
                counts["declining"] += 1
            else:
                counts["flat"] += 1
        return pd.DataFrame(
            {
                "trend": list(counts.keys()),
                "n": np.array(list(counts.values()), np.int64),
            }
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_orderkey",
                     "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("trend")["n"]
        .sum()
    )
    cols = ["trend", "n_customers", "share_micro"]
    empty = pd.DataFrame(
        {
            "trend": pd.Series([], dtype=object),
            "n_customers": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if h.empty or int(h.sum()) == 0:
        return empty
    total = int(h.sum())
    rows = []
    for k in ("declining", "flat", "growing"):
        n = int(h.get(k, 0))
        rows.append(
            (
                k, np.int64(n),
                np.int64(np.floor(
                    float(n) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_customers": np.int64, "share_micro": np.int64}
    )


ORACLES357["customer_spend_trend_census"] = """
WITH seq AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) - 1 AS x
  FROM orders
),
per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM seq GROUP BY 1
  HAVING count(*) >= 3
),
cls AS (
  SELECT CASE WHEN CAST(m AS HUGEINT) * sxy
                   - CAST(sx AS HUGEINT) * sy > 0 THEN 'growing'
              WHEN CAST(m AS HUGEINT) * sxy
                   - CAST(sx AS HUGEINT) * sy < 0 THEN 'declining'
              ELSE 'flat' END AS trend
  FROM per
),
h AS (
  SELECT trend, CAST(count(*) AS BIGINT) AS n_customers
  FROM cls GROUP BY 1
),
tot AS (SELECT CAST(sum(n_customers) AS BIGINT) AS t FROM h),
trends AS (SELECT unnest(['declining', 'flat', 'growing']) AS trend)
SELECT tr.trend,
       CAST(coalesce(h.n_customers, 0) AS BIGINT) AS n_customers,
       CAST(floor(CAST(coalesce(h.n_customers, 0) AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM trends tr LEFT JOIN h USING (trend), tot
WHERE tot.t > 0
ORDER BY tr.trend"""


QUERIES357 = {
    "events_markov_order_test": q_events_markov_order_test,
    "customer_spend_trend_census": q_customer_spend_trend_census,
}
