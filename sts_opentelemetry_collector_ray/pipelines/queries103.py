"""Driver-contract queries, wave 103 — repeat-purchase latency curve (how
fast customers place a second order, at standard day thresholds: the
retention KPI growth teams steer on) and experiment power sizing (required
per-arm sample size for a 5%-of-mean MDE from the observed variance, via
the 16σ²/δ² rule as a PURE integer ceil-division). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES103: dict[str, str] = {}

_RL_BUCKETS = 64
_RL_THRESHOLDS = (7, 30, 60, 90, 180, 365)
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# customer_repeat_latency — second-order latency curve at day thresholds
# ---------------------------------------------------------------------------


def q_customer_repeat_latency(sf_dir: str):
    """Repeat-purchase curve: among customers with ≥2 orders, the share
    whose SECOND order (by orderdate, ties by orderkey) lands within each
    threshold of the first — exact integer basis points per threshold.

    Scale shape: per-batch combiner keeps each customer's two smallest
    (date, key) pairs (np.partition-free: sort-within-group head-2);
    partials enter ONE custkey-bucket exchange whose kernel re-resolves the
    true first/second and emits only the bounded per-threshold counts; the
    driver folds |thresholds| rows."""
    th = np.array(_RL_THRESHOLDS, np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        df = pd.DataFrame({"c": c, "d": d, "k": k})
        df = df.sort_values(["c", "d", "k"], kind="mergesort")
        two = df.groupby("c", sort=False).head(2)
        two = two.copy()
        two["_b"] = (two["c"] % _RL_BUCKETS).astype(np.int64)
        return two

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "d", "k"], kind="mergesort")
        two = g.groupby("c", sort=False).head(2)
        c = two["c"].to_numpy(np.int64)
        d = two["d"].to_numpy(np.int64)
        # second row of each customer pairs with the first
        first = np.r_[True, c[1:] != c[:-1]]
        has_second = ~first
        gaps = d[has_second] - d[np.flatnonzero(has_second) - 1]
        n_multi = int(has_second.sum())
        rows = [
            {
                "threshold_days": int(t),
                "n_multi": n_multi,
                "n_within": int((gaps <= t).sum()),
            }
            for t in th
        ]
        return pd.DataFrame(rows).astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |thresholds| rows per bucket
    )
    g = part.groupby("threshold_days")[["n_multi", "n_within"]].sum().sort_index()
    nm = g["n_multi"].to_numpy(np.int64)
    nw = g["n_within"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "threshold_days": g.index.to_numpy(np.int64),
            "n_multi": nm,
            "n_within": nw,
            "share_bp": nw * 10_000 // np.maximum(nm, 1),
        }
    )


ORACLES103["customer_repeat_latency"] = f"""
WITH r AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // {_DAY_US} AS d,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
p AS (
  SELECT a.o_custkey, b.d - a.d AS gap
  FROM r a JOIN r b ON a.o_custkey = b.o_custkey AND a.rn = 1 AND b.rn = 2
),
th AS (SELECT CAST(unnest([{", ".join(str(t) for t in _RL_THRESHOLDS)}])
              AS BIGINT) AS threshold_days)
SELECT th.threshold_days,
       CAST(count(p.gap) AS BIGINT) AS n_multi,
       CAST(coalesce(count(p.gap) FILTER (p.gap <= th.threshold_days), 0)
            AS BIGINT) AS n_within,
       CAST(coalesce(count(p.gap) FILTER (p.gap <= th.threshold_days), 0)
            * 10000 // greatest(count(p.gap), 1) AS BIGINT) AS share_bp
FROM th LEFT JOIN p ON true
GROUP BY 1"""


# ---------------------------------------------------------------------------
# events_power_sizing — required per-arm n for a 5%-of-mean MDE
# ---------------------------------------------------------------------------


def q_events_power_sizing(sf_dir: str):
    """Experiment sizing per event type: with population variance σ² from
    the observed cents and MDE δ = mean/20 (a 5% relative effect), the
    required per-arm sample is the 16σ²/δ² rule —
    ceil(6400·(n·Σx² − S²) / S²), PURE integer end to end (the 16·400
    factor folds the δ² = S²/(400n²) denominator).

    Scale shape: per-batch (type, n, Σx, Σx²) combiner partials — |types|
    rows per block — fold on the driver with Python ints; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": et, "x": cents, "x2": cents * cents})
        g = (
            df.groupby("event_type", sort=False)
            .agg(n=("x", "size"), s=("x", "sum"), s2=("x2", "sum"))
            .reset_index()
        )
        return g.astype({"n": np.int64, "s": np.int64, "s2": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for ty, grp in sorted(part.groupby("event_type")):
        n = int(sum(int(v) for v in grp["n"]))
        s = int(sum(int(v) for v in grp["s"]))
        s2 = int(sum(int(v) for v in grp["s2"]))
        a = 6400 * (n * s2 - s * s)
        b = s * s
        rows.append(
            {
                "event_type": ty,
                "n": n,
                "mean_cents": s // n,
                "required_per_arm": (a + b - 1) // b if b > 0 else 0,
            }
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n", "mean_cents", "required_per_arm"]
    )
    return out.astype(
        {"n": np.int64, "mean_cents": np.int64, "required_per_arm": np.int64}
    )


ORACLES103["events_power_sizing"] = """
WITH t AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)
                  * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS HUGEINT)
           AS s2
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(s // n AS BIGINT) AS mean_cents,
       CAST(CASE WHEN s * s > 0
                 THEN (6400 * (n * s2 - s * s) + s * s - 1) // (s * s)
                 ELSE 0 END AS BIGINT) AS required_per_arm
FROM t"""


QUERIES103 = {
    "customer_repeat_latency": q_customer_repeat_latency,
    "events_power_sizing": q_events_power_sizing,
}
