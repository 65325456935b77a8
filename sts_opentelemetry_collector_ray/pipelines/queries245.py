"""Driver-contract queries, wave 245 — Cramér-von Mises and Lilliefors
normality tests of order totals per priority (both against the
moment-fitted normal, sharing the wave-197 A&S 26.2.17 Φ polynomial so
the SQL replays bit-comparable CDF values).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries197 import _phi_upper, _phi_upper_sql

ORACLES245: dict[str, str] = {}


def _phi(z: np.ndarray) -> np.ndarray:
    return np.where(z >= 0.0, 1.0 - _phi_upper(z), _phi_upper(-z))


def _phi_sql(z: str) -> str:
    return (
        f"(CASE WHEN {z} >= 0.0 THEN 1.0 - {_phi_upper_sql(z)} "
        f"ELSE {_phi_upper_sql('(-' + z + ')')} END)"
    )


def _priority_value_fold(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, value, count) distinct fold of order totals."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return (
            df.groupby(
                ["o_orderpriority", "o_totalprice"], sort=False,
                as_index=False,
            )
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return part
    return part.groupby(
        ["o_orderpriority", "o_totalprice"], as_index=False
    )["c"].sum()


def _sorted_groups(sf_dir: str):
    """Yield (priority, sorted values ndarray) with n >= 8."""
    fold = _priority_value_fold(sf_dir)
    if fold.empty:
        return
    for pr, sub in fold.groupby("o_orderpriority", sort=True):
        sub = sub.sort_values("o_totalprice", kind="mergesort")
        x = np.repeat(
            sub["o_totalprice"].to_numpy(np.float64),
            sub["c"].to_numpy(np.int64),
        )
        if len(x) >= 8:
            yield pr, x


# ---------------------------------------------------------------------------
# orders_cvm_normality — Cramér-von Mises W² per priority
# ---------------------------------------------------------------------------


def q_orders_cvm_normality(sf_dir: str):
    """Per priority: Cramér-von Mises W² = 1/(12n) + Σ_i (Φ(z_(i)) −
    (2i−1)/(2n))² against the normal fitted by the POPULATION moments
    (Φ from the shared A&S polynomial; priorities with n < 8 or zero
    variance drop). Output: o_orderpriority, n, w2_micro.

    Scale shape: distinct-value count fold per priority (full-detail scan
    at sandbox scale; the 100 TB path runs the same contract over the
    mergeable quantile sketch's bins)."""
    rows = []
    for pr, x in _sorted_groups(sf_dir):
        n = len(x)
        mu = x.sum() / n
        var = ((x - mu) ** 2).sum() / n
        if var <= 0.0:
            continue
        z = (x - mu) / np.sqrt(var)
        f = _phi(z)
        i = np.arange(1, n + 1, dtype=np.float64)
        w2 = 1.0 / (12.0 * n) + (((f - (2.0 * i - 1.0) / (2.0 * n))) ** 2).sum()
        rows.append(
            (pr, np.int64(n), np.int64(np.floor(w2 * 1_000_000.0 + 0.5)))
        )
    cols = ["o_orderpriority", "n", "w2_micro"]
    if not rows:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "o_orderpriority"
                                     else np.int64))
             for c in cols}
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES245["orders_cvm_normality"] = f"""
WITH mu AS (
  SELECT o_orderpriority, avg(o_totalprice) AS m,
         CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1 HAVING count(*) >= 8
),
m2 AS (
  SELECT o.o_orderpriority, any_value(mu.m) AS m, any_value(mu.n) AS n,
         sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m))
           / any_value(mu.n) AS var
  FROM orders o JOIN mu ON o.o_orderpriority = mu.o_orderpriority
  GROUP BY 1 HAVING sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m))
                      > 0.0
),
zt AS (
  SELECT o.o_orderpriority, m2.n,
         (o.o_totalprice - m2.m) / sqrt(m2.var) AS z,
         row_number() OVER (PARTITION BY o.o_orderpriority
                            ORDER BY o.o_totalprice) AS i
  FROM orders o JOIN m2 ON o.o_orderpriority = m2.o_orderpriority
),
terms AS (
  SELECT o_orderpriority, n,
         ({_phi_sql('z')} - (2.0 * i - 1.0) / (2.0 * n))
           * ({_phi_sql('z')} - (2.0 * i - 1.0) / (2.0 * n)) AS t
  FROM zt
)
SELECT o_orderpriority, CAST(any_value(n) AS BIGINT) AS n,
       CAST(floor((1.0 / (12.0 * any_value(n)) + sum(t)) * 1000000.0 + 0.5)
            AS BIGINT) AS w2_micro
FROM terms GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# orders_lilliefors — Lilliefors KS distance per priority
# ---------------------------------------------------------------------------


def q_orders_lilliefors(sf_dir: str):
    """Per priority: the Lilliefors statistic D = max_i max(i/n − Φ(z_(i)),
    Φ(z_(i)) − (i−1)/n) against the moment-fitted normal, with the n-scaled
    D·√n companion. Output: o_orderpriority, n, d_micro, dsqrtn_micro.

    Scale shape: same distinct-value fold as orders_cvm_normality."""
    rows = []
    for pr, x in _sorted_groups(sf_dir):
        n = len(x)
        mu = x.sum() / n
        var = ((x - mu) ** 2).sum() / n
        if var <= 0.0:
            continue
        z = (x - mu) / np.sqrt(var)
        f = _phi(z)
        i = np.arange(1, n + 1, dtype=np.float64)
        d = max(float((i / n - f).max()), float((f - (i - 1.0) / n).max()))
        rows.append(
            (pr, np.int64(n),
             np.int64(np.floor(d * 1_000_000.0 + 0.5)),
             np.int64(np.floor(d * np.sqrt(n) * 1_000_000.0 + 0.5)))
        )
    cols = ["o_orderpriority", "n", "d_micro", "dsqrtn_micro"]
    if not rows:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "o_orderpriority"
                                     else np.int64))
             for c in cols}
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES245["orders_lilliefors"] = f"""
WITH mu AS (
  SELECT o_orderpriority, avg(o_totalprice) AS m,
         CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1 HAVING count(*) >= 8
),
m2 AS (
  SELECT o.o_orderpriority, any_value(mu.m) AS m, any_value(mu.n) AS n,
         sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m))
           / any_value(mu.n) AS var
  FROM orders o JOIN mu ON o.o_orderpriority = mu.o_orderpriority
  GROUP BY 1 HAVING sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m))
                      > 0.0
),
zt AS (
  SELECT o.o_orderpriority, m2.n,
         (o.o_totalprice - m2.m) / sqrt(m2.var) AS z,
         row_number() OVER (PARTITION BY o.o_orderpriority
                            ORDER BY o.o_totalprice) AS i
  FROM orders o JOIN m2 ON o.o_orderpriority = m2.o_orderpriority
),
d AS (
  SELECT o_orderpriority, any_value(n) AS n,
         greatest(max(i / n - {_phi_sql('z')}),
                  max({_phi_sql('z')} - (i - 1.0) / n)) AS d
  FROM zt GROUP BY 1
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       CAST(floor(d * 1000000.0 + 0.5) AS BIGINT) AS d_micro,
       CAST(floor(d * sqrt(n) * 1000000.0 + 0.5) AS BIGINT) AS dsqrtn_micro
FROM d ORDER BY o_orderpriority"""


QUERIES245 = {
    "orders_cvm_normality": q_orders_cvm_normality,
    "orders_lilliefors": q_orders_lilliefors,
}
