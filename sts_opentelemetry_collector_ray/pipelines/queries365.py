"""Driver-contract queries, wave 365 — HyperLogLog distinct-count
accuracy audit over event users (64 FNV registers, trailing-zero
ranks) and ABC / Pareto revenue classification of customers. Same
contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES365: dict[str, str] = {}

_HLL_M = 64
_HLL_ALPHA = 0.709


# ---------------------------------------------------------------------------
# events_hll_accuracy — HyperLogLog vs true distinct users
# ---------------------------------------------------------------------------


def _fnv32(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc


def q_events_hll_accuracy(sf_dir: str):
    """HyperLogLog audit: every distinct user hashes (FNV-1a of the
    decimal id) into one of 64 registers (h % 64); the register keeps
    the max rank = trailing zeros of h // 64, plus one (27 for w = 0).
    Estimate alpha * m^2 / sum 2^-M_j with the small-range linear
    counting correction; registers fold in index order on both sides.
    One row: true_distinct, n_registers_hit, est_n, err_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pd.DataFrame({"u": u})

    users = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()["u"]
        .unique()
    )
    cols = ["true_distinct", "n_registers_hit", "est_n", "err_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(users)
    if n == 0:
        return empty
    reg = np.zeros(_HLL_M, np.int64)
    for u in users:
        h = _fnv32(str(int(u)))
        j = h % _HLL_M
        w = h // _HLL_M
        if w == 0:
            rho = 27
        else:
            rho = int(np.log2(float(w & -w))) + 1
        if rho > reg[j]:
            reg[j] = rho
    acc = 0.0
    for j in range(_HLL_M):
        acc = acc + 2.0 ** (-float(int(reg[j])))
    est = _HLL_ALPHA * float(_HLL_M) * float(_HLL_M) / acc
    v = int((reg == 0).sum())
    if est <= 2.5 * _HLL_M and v > 0:
        est = float(_HLL_M) * float(np.log(float(_HLL_M) / float(v)))
    err = (est - float(n)) / float(n)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(_HLL_M - v),
                np.int64(np.floor(est + 0.5)),
                np.int64(np.floor(err * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


_HLL_HASH_SQL = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(CAST(u AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
)

ORACLES365["events_hll_accuracy"] = f"""
WITH du AS (SELECT DISTINCT user_id AS u FROM events),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM du),
hashed AS (
  SELECT ({_HLL_HASH_SQL}) AS h FROM du
),
ranked AS (
  SELECT h % {_HLL_M} AS j,
         CASE WHEN h // {_HLL_M} = 0 THEN 27
              ELSE CAST(floor(log2(CAST(
                     (h // {_HLL_M}) & (-(h // {_HLL_M}))
                   AS DOUBLE))) AS BIGINT) + 1 END AS rho
  FROM hashed
),
regs AS (
  SELECT g.j, coalesce(mx.m, 0) AS m
  FROM (SELECT CAST(r.range AS BIGINT) AS j FROM range(0, {_HLL_M}) r) g
  LEFT JOIN (SELECT j, max(rho) AS m FROM ranked GROUP BY 1) mx
    USING (j)
),
folded AS (
  SELECT list_reduce(
           list_prepend(0.0, list(power(2.0, -CAST(m AS DOUBLE))
                                  ORDER BY j)),
           (a, b) -> a + b) AS acc,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM regs
),
e AS (
  SELECT nn.n, folded.v,
         CASE WHEN {_HLL_ALPHA} * {_HLL_M}.0 * {_HLL_M}.0 / folded.acc
                   <= 2.5 * {_HLL_M} AND folded.v > 0
              THEN {_HLL_M}.0 * ln({_HLL_M}.0 / folded.v)
              ELSE {_HLL_ALPHA} * {_HLL_M}.0 * {_HLL_M}.0 / folded.acc
         END AS est
  FROM nn, folded
)
SELECT n AS true_distinct,
       CAST({_HLL_M} - v AS BIGINT) AS n_registers_hit,
       CAST(floor(est + 0.5) AS BIGINT) AS est_n,
       CAST(floor((est - n) / n * 1000.0 + 0.5) AS BIGINT) AS err_milli
FROM e
WHERE n > 0"""


# ---------------------------------------------------------------------------
# orders_abc_analysis — Pareto revenue classes
# ---------------------------------------------------------------------------


def q_orders_abc_analysis(sf_dir: str):
    """ABC analysis: customers sorted by revenue (cents desc, custkey
    asc); class A while the PRIOR cumulative is below 80% of total
    revenue, B below 95%, C after — all thresholds exact integer
    floors, no floats until the share columns. Per class: abc_class,
    n_customers, revenue_cents, revenue_share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"k": df["o_custkey"].to_numpy(np.int64),
                          "s": cents})
            .groupby("k", as_index=False)["s"]
            .sum()
        )
        return g.astype(np.int64)

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["s"]
        .sum()
        .reset_index()
        .sort_values(["s", "k"], ascending=[False, True])
        .reset_index(drop=True)
    )
    cols = ["abc_class", "n_customers", "revenue_cents",
            "revenue_share_micro"]
    empty = pd.DataFrame(
        {
            "abc_class": pd.Series([], dtype=object),
            "n_customers": pd.Series([], dtype=np.int64),
            "revenue_cents": pd.Series([], dtype=np.int64),
            "revenue_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if per.empty:
        return empty
    s = per["s"].to_numpy(np.int64)
    total = int(s.sum())
    if total <= 0:
        return empty
    cum = np.cumsum(s)
    prev = cum - s
    t80 = (4 * total) // 5
    t95 = (19 * total) // 20
    cls = np.where(prev < t80, "A", np.where(prev < t95, "B", "C"))
    g = (
        pd.DataFrame({"abc_class": cls, "n": 1, "rev": s})
        .groupby("abc_class", as_index=False)
        .agg({"n": "sum", "rev": "sum"})
        .sort_values("abc_class")
    )
    out = pd.DataFrame(
        {
            "abc_class": g["abc_class"].to_numpy(object),
            "n_customers": g["n"].to_numpy(np.int64),
            "revenue_cents": g["rev"].to_numpy(np.int64),
            "revenue_share_micro": np.floor(
                g["rev"].to_numpy(np.int64).astype(np.float64)
                / float(total) * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )
    return out.reset_index(drop=True)


ORACLES365["orders_abc_analysis"] = """
WITH per AS (
  SELECT o_custkey AS k,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM per),
cum AS (
  SELECT s,
         sum(s) OVER (ORDER BY s DESC, k
                      ROWS UNBOUNDED PRECEDING) - s AS prev
  FROM per
),
cls AS (
  SELECT CASE WHEN prev < (4 * tot.t) // 5 THEN 'A'
              WHEN prev < (19 * tot.t) // 20 THEN 'B'
              ELSE 'C' END AS abc_class,
         s
  FROM cum, tot
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(s) AS BIGINT) AS revenue_cents,
       CAST(floor(CAST(sum(s) AS DOUBLE) / tot.t * 1000000.0 + 0.5)
            AS BIGINT) AS revenue_share_micro
FROM cls, tot
WHERE tot.t > 0
GROUP BY 1, tot.t
ORDER BY abc_class"""


QUERIES365 = {
    "events_hll_accuracy": q_events_hll_accuracy,
    "orders_abc_analysis": q_orders_abc_analysis,
}
