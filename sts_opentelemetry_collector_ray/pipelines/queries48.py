"""Driver-contract queries, wave 48 — Gini coefficient of per-user spend (the
inequality/concentration report) and the Benford first-digit audit (the
fraud-detection / data-fabrication screen). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES48: dict[str, str] = {}

_GINI_USER_BUCKETS = 32


# ---------------------------------------------------------------------------
# events_spend_gini — Gini coefficient of per-user total spend
# ---------------------------------------------------------------------------


def q_events_spend_gini(sf_dir: str):
    """Gini concentration of per-user spend (the whale-dependency report):
    G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending per-user totals —
    tie-order-invariant, so any stable rank assignment replays. Everything
    integer until the final ratio (rank-block sums fold the value histogram
    with c·p + c(c+1)/2 — no per-rank materialization).

    Per-batch (user, cents) partials → ONE user-bucket exchange for exact
    per-user sums → (sum-value, count) histogram to the driver (bounded by
    the distinct-sum domain, the percentile_rank contract). Output: one row —
    n_users, total_cents, gini_micro."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "cents": cents})
        out = df.groupby("user_id", sort=False)["cents"].sum().reset_index()
        out["cents"] = out["cents"].astype(np.int64)
        out["_b"] = (out["user_id"].to_numpy() % _GINI_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby("user_id")["cents"].sum()
        v, c = np.unique(sums.to_numpy(), return_counts=True)
        return pd.DataFrame({"v": v.astype(np.int64), "c": c.astype(np.int64)})

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: hist(g.drop(columns=["_b"])), batch_format="pandas")
        .to_pandas()  # bounded: distinct-sum rows per bucket
        .groupby("v")["c"]
        .sum()
        .sort_index()
    )
    v = h.index.to_numpy().astype(np.int64)
    c = h.to_numpy().astype(np.int64)
    n = int(c.sum())
    total = int((v * c).sum())
    prev = np.concatenate([[0], np.cumsum(c)[:-1]])
    s_rank = int((v * (c * prev + c * (c + 1) // 2)).sum())  # Σ i·x₍ᵢ₎
    num = 2 * s_rank - (n + 1) * total
    den = n * total
    gini_micro = np.int64(np.floor(1_000_000.0 * num / den + 0.5))
    return pd.DataFrame(
        {
            "n_users": [np.int64(n)],
            "total_cents": [np.int64(total)],
            "gini_micro": [gini_micro],
        }
    )


ORACLES48["events_spend_gini"] = """
WITH s AS (
  SELECT user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
),
r AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM s
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total,
         CAST(SUM(rn * cents) AS BIGINT) AS s_rank
  FROM r
)
SELECT n AS n_users, total AS total_cents,
       CAST(floor(1000000.0 * (2 * s_rank - (n + 1) * total) / (n * total)
                  + 0.5) AS BIGINT) AS gini_micro
FROM agg"""


# ---------------------------------------------------------------------------
# orders_benford_audit — first-digit Benford screen
# ---------------------------------------------------------------------------


def q_orders_benford_audit(sf_dir: str):
    """Benford first-digit audit (the classic fabricated-data screen:
    naturally-scaled amounts follow P(d) = log10(1 + 1/d)): observed leading
    digits of order totals vs the Benford expectation, with the chi-square
    statistic summed in fixed digit order (sequential cumsum ≡ ordered
    list_sum). One bounded (digit, count) combiner exchange. Output per
    digit: digit, obs, expected_micro, chi2_micro (the statistic, constant
    across rows)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        first = pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents), pa.string()), 0, 1
        )
        d = pc.cast(first, pa.int64()).to_numpy(zero_copy_only=False)
        dig, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"digit": pa.array(dig), "cnt": pa.array(cnt.astype(np.int64))}
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤9 rows per block
        .groupby("digit")["cnt"]
        .sum()
        .reindex(np.arange(1, 10), fill_value=0)
    )
    obs = h.to_numpy().astype(np.int64)
    n = int(obs.sum())
    digits = np.arange(1, 10, dtype=np.int64)
    p = np.log10(1.0 + 1.0 / digits.astype(np.float64))
    expected = n * p
    terms = (obs.astype(np.float64) - expected) ** 2 / expected
    chi2 = terms.cumsum()[-1]  # sequential fold ≡ SQL ordered list_sum
    return pd.DataFrame(
        {
            "digit": digits,
            "obs": obs,
            "expected_micro": np.floor(expected * 1e6 + 0.5).astype(np.int64),
            "chi2_micro": np.full(9, np.floor(chi2 * 1e6 + 0.5), dtype=np.int64),
        }
    )


ORACLES48["orders_benford_audit"] = """
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
cnts AS (
  SELECT g.digit, CAST(coalesce(c.obs, 0) AS BIGINT) AS obs
  FROM (SELECT UNNEST(range(1, 10)) AS digit) g
  LEFT JOIN (SELECT digit, count(*) AS obs FROM d GROUP BY digit) c
    ON c.digit = g.digit
),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cnts),
terms AS (
  SELECT digit, obs,
         n * log10(1.0 + 1.0 / digit) AS expected,
         (obs - n * log10(1.0 + 1.0 / digit)) * (obs - n * log10(1.0 + 1.0 / digit))
           / (n * log10(1.0 + 1.0 / digit)) AS term
  FROM cnts CROSS JOIN tot
),
chi AS (
  SELECT CAST(floor(list_sum(list(term ORDER BY digit)) * 1000000 + 0.5)
              AS BIGINT) AS chi2_micro
  FROM terms
)
SELECT CAST(t.digit AS BIGINT) AS digit, t.obs,
       CAST(floor(t.expected * 1000000 + 0.5) AS BIGINT) AS expected_micro,
       chi.chi2_micro
FROM terms t CROSS JOIN chi"""


QUERIES48 = {
    "events_spend_gini": q_events_spend_gini,
    "orders_benford_audit": q_orders_benford_audit,
}
