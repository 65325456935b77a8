"""Driver-contract queries, wave 204 — group-fairness audit of a threshold
score (demographic parity, TPR/FPR per nation) and a Luhn checksum audit
over order keys (check-digit distribution + validity rate).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES204: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customer_fairness_audit — demographic parity / TPR / FPR per nation
# ---------------------------------------------------------------------------


def q_customer_fairness_audit(sf_dir: str):
    """Fairness audit of the classifier 'balance above the global lower
    median' against the outcome 'customer is active' per nation group:
    positive rate, TPR and FPR in micro units (−1 when the class is empty),
    plus the global demographic-parity gap max−min positive rate as a
    constant column (Feldman et al. 2015). Output: c_nationkey, n,
    pos_rate_micro, tpr_micro, fpr_micro, dp_gap_micro.

    Scale shape: order-presence folds via a distinct-custkey combiner;
    customer is dimension-sized, so the threshold (an order statistic) and
    the group grid evaluate on the driver — no shuffle."""
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
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).to_pandas()
    cols = [
        "c_nationkey", "n", "pos_rate_micro", "tpr_micro", "fpr_micro",
        "dp_gap_micro",
    ]
    if cust.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    bal = np.sort(cust["c_acctbal"].to_numpy(np.float64))
    med = bal[(len(bal) + 1) // 2 - 1]
    cust["s"] = (cust["c_acctbal"].to_numpy(np.float64) > med).astype(np.int64)
    cust["y"] = cust["c_custkey"].isin(active).astype(np.int64)
    rows = []
    pos_rates = []
    for nk, sub in cust.groupby("c_nationkey", sort=True):
        n = len(sub)
        s = sub["s"].to_numpy(np.int64)
        y = sub["y"].to_numpy(np.int64)
        pos = int(s.sum())
        n1 = int(y.sum())
        n0 = n - n1
        tp = int((s & y).sum())
        fp = pos - tp
        pr = pos / float(n)
        pos_rates.append(pr)
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            [
                np.int64(nk), np.int64(n), micro(pr),
                micro(tp / float(n1)) if n1 > 0 else np.int64(-1),
                micro(fp / float(n0)) if n0 > 0 else np.int64(-1),
            ]
        )
    gap = np.int64(
        np.floor((max(pos_rates) - min(pos_rates)) * 1_000_000.0 + 0.5)
    )
    for r in rows:
        r.append(gap)
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


ORACLES204["customer_fairness_audit"] = """
WITH med AS (
  SELECT c_acctbal AS m FROM (
    SELECT c_acctbal, row_number() OVER (ORDER BY c_acctbal) AS r,
           count(*) OVER () AS n
    FROM customer
  ) WHERE r = (n + 1) // 2
),
act AS (SELECT DISTINCT o_custkey FROM orders),
c AS (
  SELECT c_nationkey,
         CASE WHEN c_acctbal > med.m THEN 1 ELSE 0 END AS s,
         CASE WHEN act.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
  FROM customer LEFT JOIN act ON c_custkey = act.o_custkey, med
),
g AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS pos,
         CAST(sum(y) AS BIGINT) AS n1,
         CAST(sum(s * y) AS BIGINT) AS tp
  FROM c GROUP BY 1
),
r AS (
  SELECT c_nationkey, n, pos, n1, tp,
         CAST(pos AS DOUBLE) / n AS pr
  FROM g
),
gap AS (
  SELECT floor((max(pr) - min(pr)) * 1000000.0 + 0.5) AS dp FROM r
)
SELECT CAST(r.c_nationkey AS BIGINT) AS c_nationkey, r.n,
       CAST(floor(r.pr * 1000000.0 + 0.5) AS BIGINT) AS pos_rate_micro,
       CAST(CASE WHEN r.n1 > 0
                 THEN floor(CAST(r.tp AS DOUBLE) / r.n1 * 1000000.0 + 0.5)
                 ELSE -1 END AS BIGINT) AS tpr_micro,
       CAST(CASE WHEN r.n - r.n1 > 0
                 THEN floor(CAST(r.pos - r.tp AS DOUBLE) / (r.n - r.n1)
                            * 1000000.0 + 0.5)
                 ELSE -1 END AS BIGINT) AS fpr_micro,
       CAST(gap.dp AS BIGINT) AS dp_gap_micro
FROM r, gap ORDER BY r.c_nationkey"""


# ---------------------------------------------------------------------------
# orders_luhn_audit — Luhn check-digit distribution and validity rate
# ---------------------------------------------------------------------------

_LUHN_DIGITS = 18


def _luhn_check(payload: np.ndarray) -> np.ndarray:
    """Luhn check digit of each payload (doubling from the rightmost
    payload digit; ISO/IEC 7812)."""
    s = np.zeros(len(payload), np.int64)
    for i in range(_LUHN_DIGITS):
        d = (payload // 10**i) % 10
        if i % 2 == 0:
            dd = d * 2
            dd = np.where(dd > 9, dd - 9, dd)
        else:
            dd = d
        s += dd
    return (10 - s % 10) % 10


def q_orders_luhn_audit(sf_dir: str):
    """Luhn audit over order keys: per check digit of the payload
    okey // 10, the count and share (micro), plus the constant validity
    rate — the share of keys whose LAST digit equals that Luhn check digit.
    Output: check_digit, n, share_micro, valid_rate_micro.

    Scale shape: one per-batch digit-arithmetic combiner (10 cells);
    driver folds 10×blocks rows — no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        payload = ok // 10
        chk = _luhn_check(payload)
        valid = (ok % 10 == chk).astype(np.int64)
        df = pd.DataFrame({"check_digit": chk, "n": 1, "valid": valid})
        return df.groupby("check_digit", sort=False, as_index=False).sum().astype(
            np.int64
        )

    part = (
        ray.data.read_parquet(path, columns=["o_orderkey"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["check_digit", "n", "share_micro", "valid_rate_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby("check_digit")[["n", "valid"]].sum().sort_index()
    total = float(g["n"].sum())
    valid_rate = np.int64(
        np.floor(g["valid"].sum() / total * 1_000_000.0 + 0.5)
    )
    return pd.DataFrame(
        {
            "check_digit": np.asarray(g.index.to_numpy(np.int64)),
            "n": g["n"].to_numpy(np.int64),
            "share_micro": np.floor(
                g["n"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
            ).astype(np.int64),
            "valid_rate_micro": np.full(len(g), valid_rate, np.int64),
        }
    )


def _luhn_sql(payload: str) -> str:
    terms = []
    for i in range(_LUHN_DIGITS):
        d = f"(({payload} // {10**i}) % 10)"
        if i % 2 == 0:
            terms.append(f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)")
        else:
            terms.append(d)
    return f"((10 - ({' + '.join(terms)}) % 10) % 10)"


ORACLES204["orders_luhn_audit"] = f"""
WITH b AS (
  SELECT o_orderkey,
         {_luhn_sql('(o_orderkey // 10)')} AS chk
  FROM orders
),
g AS (
  SELECT chk AS check_digit,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderkey % 10 = chk THEN 1 ELSE 0 END)
              AS BIGINT) AS valid
  FROM b GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(sum(valid) AS DOUBLE) AS v
        FROM g)
SELECT CAST(g.check_digit AS BIGINT) AS check_digit, g.n,
       CAST(floor(g.n / tot.t * 1000000.0 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor(tot.v / tot.t * 1000000.0 + 0.5) AS BIGINT)
         AS valid_rate_micro
FROM g, tot ORDER BY check_digit"""


QUERIES204 = {
    "customer_fairness_audit": q_customer_fairness_audit,
    "orders_luhn_audit": q_orders_luhn_audit,
}
