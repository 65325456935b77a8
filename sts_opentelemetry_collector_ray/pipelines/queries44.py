"""Driver-contract queries, wave 44 — SLO burn-rate window scan (the SRE
error-budget alerting computation replayed over the batch stream) and
Hamilton largest-remainder apportionment (exact integer allocation of a fixed
sampling budget across strata). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES44: dict[str, str] = {}

_BR_USER_BUCKETS = 32
_BR_SLO_MULT = 20  # SLO = 0.95 → burn = (fail/req) / (1 − 0.95) = 20·fail/req
_AP_BUDGET = 1000  # total samples to apportion


# ---------------------------------------------------------------------------
# events_burn_rate — per-user worst-window SLO burn rate
# ---------------------------------------------------------------------------


def q_events_burn_rate(sf_dir: str):
    """SLO burn-rate scan (the multiwindow error-budget alert, Google SRE
    workbook ch.5): per user and hour window, burn = (failures/requests) /
    (1 − SLO) with SLO = 0.95; report each user's WORST window. 'error'
    events are the failures. Pure integer: burn micro-rounds via the
    (2a+b)//(2b) form, argmax ties break to the earliest hour.

    Per-batch (user, hour, req, fail) count partials → ONE user-bucket
    exchange → vectorized per-user argmax over its hours. Output: user_id,
    n_hours, worst_hour (epoch hours), worst_burn_micro."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (tu // 3_600_000_000).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        fail = (
            pc.equal(t["event_type"], "error").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "hour": hour, "fail": fail})
        out = (
            df.groupby(["user_id", "hour"], sort=False)
            .agg(req=("fail", "size"), fail=("fail", "sum"))
            .reset_index()
        )
        out["req"] = out["req"].astype(np.int64)
        out["fail"] = out["fail"].astype(np.int64)
        out["_b"] = (out["user_id"].to_numpy() % _BR_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def worst(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["user_id", "hour"], sort=False)
            .agg(req=("req", "sum"), fail=("fail", "sum"))
            .reset_index()
        )
        req = agg["req"].to_numpy().astype(np.int64)
        fail = agg["fail"].to_numpy().astype(np.int64)
        burn = (2 * 1_000_000 * _BR_SLO_MULT * fail + req) // (2 * req)
        agg["burn"] = burn
        agg = agg.sort_values(
            ["user_id", "burn", "hour"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = agg.groupby("user_id", sort=False).head(1)
        cnts = agg.groupby("user_id", sort=False)["hour"].size()
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy().astype(np.int64),
                "n_hours": cnts.loc[top["user_id"]].to_numpy().astype(np.int64),
                "worst_hour": top["hour"].to_numpy().astype(np.int64),
                "worst_burn_micro": top["burn"].to_numpy().astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: worst(g.drop(columns=["_b"])), batch_format="pandas")
    )


ORACLES44["events_burn_rate"] = f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) AS req,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS fail
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT user_id, hour, req,
         (2 * 1000000 * {_BR_SLO_MULT} * fail + req) // (2 * req) AS burn,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY (2 * 1000000 * {_BR_SLO_MULT} * fail + req)
                                     // (2 * req) DESC, hour ASC) AS r,
         count(*) OVER (PARTITION BY user_id) AS n_hours
  FROM w
)
SELECT user_id, CAST(n_hours AS BIGINT) AS n_hours,
       CAST(hour AS BIGINT) AS worst_hour,
       CAST(burn AS BIGINT) AS worst_burn_micro
FROM b WHERE r = 1"""


# ---------------------------------------------------------------------------
# events_sample_quotas — Hamilton largest-remainder apportionment
# ---------------------------------------------------------------------------


def q_events_sample_quotas(sf_dir: str):
    """Hamilton largest-remainder apportionment (the exact way to split a
    fixed sampling budget across strata so quotas sum EXACTLY to the budget):
    quota_g = floor(K·n_g/N), then the leftover seats go to the largest
    remainders (ties → event_type ASC). Pure integer throughout. One bounded
    (type, count) combiner exchange; the apportionment runs on the
    |strata|-row grid."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["event_type"])
            .group_by("event_type")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "pn"])

    counts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")["pn"]
        .sum()
        .sort_index()
    )
    n = counts.to_numpy().astype(np.int64)
    total = int(n.sum())
    base = (_AP_BUDGET * n) // total
    rem = (_AP_BUDGET * n) % total
    leftover = _AP_BUDGET - int(base.sum())
    order = np.lexsort((np.arange(len(n)), -rem))  # rem desc, type-order asc
    bonus = np.zeros(len(n), dtype=np.int64)
    bonus[order[:leftover]] = 1
    return pd.DataFrame(
        {
            "event_type": counts.index.to_numpy(dtype=object),
            "n": n,
            "quota": base + bonus,
        }
    ).astype({"n": np.int64, "quota": np.int64})


ORACLES44["events_sample_quotas"] = f"""
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
q AS (
  SELECT event_type, n,
         ({_AP_BUDGET} * n) // total AS base,
         ({_AP_BUDGET} * n) % total AS rem
  FROM c CROSS JOIN t
),
lo AS (
  SELECT CAST({_AP_BUDGET} - SUM(base) AS BIGINT) AS leftover FROM q
),
r AS (
  SELECT event_type, n, base,
         row_number() OVER (ORDER BY rem DESC, event_type ASC) AS rk
  FROM q
)
SELECT event_type, n,
       CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM r CROSS JOIN lo"""


QUERIES44 = {
    "events_burn_rate": q_events_burn_rate,
    "events_sample_quotas": q_events_sample_quotas,
}
