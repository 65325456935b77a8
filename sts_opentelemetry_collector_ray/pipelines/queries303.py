"""Driver-contract queries, wave 303 — error-recovery latency per
conversation (turns from an [ERROR] turn to the next error-free turn)
and the CR-k concentration ratios of customer spend (the antitrust
CR1/CR4/CR8/CR20 view complementing HHI/top-shares). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES303: dict[str, str] = {}

_CR_BUCKETS = 64


# ---------------------------------------------------------------------------
# conv_error_recovery_time — turns until the next error-free turn
# ---------------------------------------------------------------------------


def q_conv_error_recovery_time(sf_dir: str):
    """Recovery latency: for every [ERROR]-tagged turn, the gap in
    turn_idx to the NEXT turn without an [ERROR] tag in the same
    conversation (unrecovered = no such later turn). Per conversation
    with at least one error turn: conv_id, n_errors, n_recovered,
    sum_gap, avg_gap_micro. Pure integer counting.

    Scale shape: ONE conv-bucket exchange; the next-ok lookup is a
    reversed cumulative minimum per conversation — fully vectorized."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "err": pc.match_substring(t["text"], "[ERROR]").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_errors": pd.Series([], dtype=np.int64),
                "n_recovered": pd.Series([], dtype=np.int64),
                "sum_gap": pd.Series([], dtype=np.int64),
                "avg_gap_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty_m
        g = g.sort_values(["conv", "turn"], kind="stable")
        rows = []
        for conv, sub in g.groupby("conv", sort=False):
            turn = sub["turn"].to_numpy(np.int64)
            err = sub["err"].to_numpy(np.int64)
            n_err = int(err.sum())
            if n_err == 0:
                continue
            # next ok turn index (strictly after) via reversed cummin
            ok_turn = np.where(err == 0, turn, np.iinfo(np.int64).max)
            rev = np.minimum.accumulate(ok_turn[::-1])[::-1]
            nxt_ok = np.concatenate(
                [rev[1:], [np.iinfo(np.int64).max]]
            )
            is_err = err == 1
            rec = nxt_ok[is_err] < np.iinfo(np.int64).max
            gaps = (nxt_ok[is_err][rec] - turn[is_err][rec]).astype(np.int64)
            n_rec = int(rec.sum())
            sum_gap = int(gaps.sum())
            avg = (
                int(np.floor(float(sum_gap) / float(n_rec) * 1_000_000.0
                             + 0.5))
                if n_rec > 0 else 0
            )
            rows.append(
                (
                    conv, np.int64(n_err), np.int64(n_rec),
                    np.int64(sum_gap), np.int64(avg),
                )
            )
        if not rows:
            return empty_m
        return pd.DataFrame(
            rows,
            columns=["conv_id", "n_errors", "n_recovered", "sum_gap",
                     "avg_gap_micro"],
        ).astype(
            {c: np.int64 for c in
             ("n_errors", "n_recovered", "sum_gap", "avg_gap_micro")}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _recovery_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
seq AS (
  SELECT conv_id, turn_idx,
         CAST(contains(text, '[ERROR]') AS BIGINT) AS err,
         min(CASE WHEN NOT contains(text, '[ERROR]') THEN turn_idx END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt_ok
  FROM transcripts
),
agg AS (
  SELECT conv_id,
         CAST(sum(err) AS BIGINT) AS n_errors,
         CAST(sum(CASE WHEN err = 1 AND nxt_ok IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered,
         CAST(coalesce(sum(CASE WHEN err = 1 AND nxt_ok IS NOT NULL
                                THEN nxt_ok - turn_idx END), 0) AS BIGINT)
           AS sum_gap
  FROM seq GROUP BY 1
)
SELECT conv_id, n_errors, n_recovered, sum_gap,
       CAST(CASE WHEN n_recovered > 0
                 THEN floor(CAST(sum_gap AS DOUBLE)
                            / CAST(n_recovered AS DOUBLE)
                            * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS avg_gap_micro
FROM agg
WHERE n_errors > 0"""
    )


# ---------------------------------------------------------------------------
# customer_crk_concentration — CR-k spend concentration ratios
# ---------------------------------------------------------------------------


def q_customer_crk_concentration(sf_dir: str):
    """Concentration ratios of customer spend: CR_k = share of total
    order cents held by the k biggest customers, for k in
    {1, 4, 8, 20}. Per-customer spend reduces exactly; the top-k pick
    runs on the bounded spend histogram (sum of the k largest values,
    splitting ties by count). Per k: k, top_cents, cr_micro.

    Scale shape: the `customer_hoover` bucketed spend-histogram
    reduce."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"k": df["o_custkey"].to_numpy(np.int64), "s": cents}
            )
            .groupby("k", sort=False)["s"]
            .sum()
            .reset_index()
        )
        g["s"] = g["s"].astype(np.int64)
        g["_b"] = (g["k"].to_numpy(np.int64) % _CR_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("k", sort=False)["s"].sum()
        h = per.groupby(per.values).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index(ascending=False)
    )
    cols = ["k", "top_cents", "cr_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64).astype(object)
    c = hist.to_numpy(np.int64).astype(object)
    total = int((y * c).sum())
    n_cust = int(c.sum())
    if total <= 0:
        return empty
    cum_n = np.cumsum(c)
    cum_s = np.cumsum(y * c)
    rows = []
    for k in (1, 4, 8, 20):
        if k > n_cust:
            continue
        i = int(np.searchsorted(cum_n, k, side="left"))
        below_n = int(cum_n[i - 1]) if i > 0 else 0
        below_s = int(cum_s[i - 1]) if i > 0 else 0
        top = below_s + (k - below_n) * int(y[i])
        rows.append(
            (
                np.int64(k), np.int64(top),
                np.int64(np.floor(
                    float(top) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c_: np.int64 for c_ in cols}
    )


ORACLES303["customer_crk_concentration"] = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM spend GROUP BY 1),
tot AS (SELECT CAST(sum(y * c) AS BIGINT) AS t,
               CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (
  SELECT y, c,
         sum(c) OVER (ORDER BY y DESC) AS cn,
         sum(y * c) OVER (ORDER BY y DESC) AS cs,
         coalesce(sum(c) OVER (ORDER BY y DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below_n,
         coalesce(sum(y * c) OVER (ORDER BY y DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below_s
  FROM h
),
ks AS (SELECT CAST(u.k AS BIGINT) AS k
       FROM (SELECT unnest([1, 4, 8, 20]) AS k) u),
pick AS (
  SELECT ks.k, max(cum.y) AS yk
  FROM ks, tot JOIN cum ON cum.cn >= ks.k
  WHERE ks.k <= tot.n
  GROUP BY 1
)
SELECT p.k,
       CAST(c.below_s + (p.k - c.below_n) * p.yk AS BIGINT) AS top_cents,
       CAST(floor(CAST(c.below_s + (p.k - c.below_n) * p.yk AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS cr_micro
FROM pick p JOIN cum c ON c.y = p.yk, tot
WHERE tot.t > 0
ORDER BY p.k"""


def _register_dynamic() -> None:
    ORACLES303["conv_error_recovery_time"] = _recovery_oracle()


_register_dynamic()

QUERIES303 = {
    "conv_error_recovery_time": q_conv_error_recovery_time,
    "customer_crk_concentration": q_customer_crk_concentration,
}
