"""Driver-contract queries, wave 150 — hourly dispersion index per event
type (Fano factor of hourly counts: > 1 flags bursty arrivals that break
uniform-rate capacity math) and exact per-nation customer balance quantiles
(the grouped value-histogram engine over the customer dimension). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES150: dict[str, str] = {}

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# events_fano_factor — dispersion index of hourly counts per type
# ---------------------------------------------------------------------------


def q_events_fano_factor(sf_dir: str):
    """Per event type with >= 2 active hours: number of active hours, total
    events, and the Fano factor (variance / mean of the per-hour counts over
    ACTIVE hours — the documented contract: empty hours are absent, so this
    measures burstiness among observed hours) in micro units. Every moment
    is an exact integer; fano = (h·Σc² − (Σc)²) / (h·Σc) via ONE shared
    double division.

    Scale shape: per-batch (type, hour, n) combiner over the bounded
    |types| × |hours| grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        hour = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _HOUR_US
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "hour": hour,
                    "n": 1,
                }
            )
            .groupby(["event_type", "hour"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"hour": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_hours": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "fano_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = (
        part.groupby(["event_type", "hour"], sort=False)["n"].sum().reset_index()
    )
    grid["n2"] = grid["n"].astype(object) * grid["n"]
    out = (
        grid.groupby("event_type", sort=True)
        .agg(n_hours=("hour", "count"), n_events=("n", "sum"), s2=("n2", "sum"))
        .reset_index()
    )
    out = out[out["n_hours"] >= 2]
    if out.empty:
        return empty
    h = out["n_hours"].to_numpy(np.int64)
    s = out["n_events"].to_numpy(object)
    s2 = out["s2"].to_numpy(object)
    num = h * s2 - s * s  # exact bigints
    den = h * s
    out["fano_micro"] = np.floor(
        num.astype(np.float64) / den.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["event_type", "n_hours", "n_events", "fano_micro"]].astype(
        {"n_hours": np.int64, "n_events": np.int64, "fano_micro": np.int64}
    )


ORACLES150["events_fano_factor"] = f"""
WITH g AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hour,
         CAST(count(*) AS HUGEINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS h,
         sum(n) AS s, sum(n * n) AS s2
  FROM g GROUP BY 1 HAVING count(*) >= 2
)
SELECT event_type,
       CAST(h AS BIGINT) AS n_hours,
       CAST(s AS BIGINT) AS n_events,
       CAST(floor(CAST(h * s2 - s * s AS DOUBLE) / CAST(h * s AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS fano_micro
FROM s"""


# ---------------------------------------------------------------------------
# customer_balance_quantiles — exact p50/p90 of acctbal per nation
# ---------------------------------------------------------------------------


def q_customer_balance_quantiles(sf_dir: str):
    """Exact p50/p90 of customer account balance per nation — the grouped
    value-histogram quantile engine over the customer dimension; balances
    quantize to exact cents so the exchange carries the distinct-cents
    histogram."""
    import pyarrow.compute as pc

    from ..stages.quantiles import grouped_quantiles_exact

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "value": t["c_acctbal"],
            }
        )

    return grouped_quantiles_exact(
        ds.map_batches(project, batch_format="pyarrow"), "value", "c_nationkey"
    )


ORACLES150["customer_balance_quantiles"] = """
WITH b AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
c AS (
  SELECT c_nationkey, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2
),
t AS (SELECT c_nationkey, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT c_nationkey, cents,
         sum(cnt) OVER (PARTITION BY c_nationkey ORDER BY cents) AS cum
  FROM c
),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT t.c_nationkey, q.q_label, t.n, min(cum.cents) AS cents
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.c_nationkey = t.c_nationkey
          AND cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, q_label, n, cents / 100.0 AS value FROM pick"""


QUERIES150 = {
    "events_fano_factor": q_events_fano_factor,
    "customer_balance_quantiles": q_customer_balance_quantiles,
}
