"""Driver-contract queries, wave 195 — inverse-propensity-weighted ATE
(afternoon 'treatment' on event value, day-of-week strata) and a sequential
probability ratio test replay over the daily up/down series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES195: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_ipw_ate — IPW average treatment effect per event type
# ---------------------------------------------------------------------------


def q_events_ipw_ate(sf_dir: str):
    """Per event type, the 'afternoon effect' on value: treatment T = hour ≥
    12, confounder X = day-of-week. Naive ATE = mean(Y|T=1) − mean(Y|T=0);
    IPW ATE = Σ_x [Σy₁(x)/e(x) − Σy₀(x)/(1−e(x))] / N over strata with
    0 < e(x) < 1 (Horvitz-Thompson estimator; positivity-violating strata
    drop from both the sum and N). Output: event_type, n_used,
    ate_naive_micro, ate_ipw_micro.

    Scale shape: one (type, dow, T) bounded cell combiner (|types|×7×2);
    driver folds cells×blocks rows — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts", "value"]).to_pandas()
        d = df["ts"].dt
        df["dow"] = d.dayofweek.to_numpy(np.int64)
        df["t"] = (d.hour.to_numpy() >= 12).astype(np.int64)
        df["n"] = 1
        g = df.groupby(["event_type", "dow", "t"], sort=False, as_index=False).agg(
            n=("n", "sum"), sy=("value", "sum")
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_used", "ate_naive_micro", "ate_ipw_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    cells = part.groupby(["event_type", "dow", "t"], as_index=False).sum()
    rows = []
    for et, sub in cells.groupby("event_type", sort=True):
        p = sub.pivot_table(
            index="dow", columns="t", values=["n", "sy"], fill_value=0,
            aggfunc="sum",
        )
        n0 = p.get(("n", 0), pd.Series(dtype=float)).reindex(p.index, fill_value=0).to_numpy(np.float64)
        n1 = p.get(("n", 1), pd.Series(dtype=float)).reindex(p.index, fill_value=0).to_numpy(np.float64)
        sy0 = p.get(("sy", 0), pd.Series(dtype=float)).reindex(p.index, fill_value=0).to_numpy(np.float64)
        sy1 = p.get(("sy", 1), pd.Series(dtype=float)).reindex(p.index, fill_value=0).to_numpy(np.float64)
        tn0, tn1 = float(n0.sum()), float(n1.sum())
        if tn0 == 0.0 or tn1 == 0.0:
            continue
        naive = sy1.sum() / tn1 - sy0.sum() / tn0
        keep = (n0 > 0) & (n1 > 0)
        if not keep.any():
            continue
        e = n1[keep] / (n0[keep] + n1[keep])
        n_used = float((n0[keep] + n1[keep]).sum())
        ipw = float((sy1[keep] / e - sy0[keep] / (1.0 - e)).sum() / n_used)
        rows.append(
            (
                et, np.int64(n_used),
                np.int64(np.floor(naive * 1_000_000.0 + 0.5)),
                np.int64(np.floor(ipw * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES195["events_ipw_ate"] = """
WITH c AS (
  SELECT event_type, dayofweek(ts) AS dow,
         CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS t,
         count(*) AS n, sum(value) AS sy
  FROM events GROUP BY 1, 2, 3
),
g AS (
  SELECT event_type, dow,
         sum(CASE WHEN t = 0 THEN n ELSE 0 END) AS n0,
         sum(CASE WHEN t = 1 THEN n ELSE 0 END) AS n1,
         sum(CASE WHEN t = 0 THEN sy ELSE 0.0 END) AS sy0,
         sum(CASE WHEN t = 1 THEN sy ELSE 0.0 END) AS sy1
  FROM c GROUP BY 1, 2
),
tot AS (
  SELECT event_type, sum(n0) AS tn0, sum(n1) AS tn1,
         sum(sy0) AS tsy0, sum(sy1) AS tsy1
  FROM g GROUP BY 1 HAVING sum(n0) > 0 AND sum(n1) > 0
),
kept AS (
  SELECT event_type,
         sum(n0 + n1) AS n_used,
         sum(sy1 / (CAST(n1 AS DOUBLE) / (n0 + n1))
             - sy0 / (1.0 - CAST(n1 AS DOUBLE) / (n0 + n1))) AS ipw_num
  FROM g WHERE n0 > 0 AND n1 > 0 GROUP BY 1
)
SELECT tot.event_type,
       CAST(kept.n_used AS BIGINT) AS n_used,
       CAST(floor((tsy1 / tn1 - tsy0 / tn0) * 1000000.0 + 0.5) AS BIGINT)
         AS ate_naive_micro,
       CAST(floor(ipw_num / kept.n_used * 1000000.0 + 0.5) AS BIGINT)
         AS ate_ipw_micro
FROM tot JOIN kept ON tot.event_type = kept.event_type
ORDER BY tot.event_type"""


# ---------------------------------------------------------------------------
# events_sprt — sequential probability ratio test on daily up-moves
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.5, 0.6
_SPRT_A = math.log(19.0)  # alpha = beta = 0.05


def q_events_sprt(sf_dir: str):
    """Wald SPRT (Wald 1945) per event type over the daily up-move series
    x_t = 1{count_t > count_{t−1}}: cumulative log-likelihood ratio for
    H₁: p = 0.6 vs H₀: p = 0.5, thresholds ±ln 19 (α = β = 0.05). Output:
    n_steps, decision ('h0'/'h1'/'continue'), decision day (yyyymmdd of the
    first crossing, 0 if none) and the final LLR in micro units.

    Scale shape: bounded daily fold; one cumulative scan per type — no
    shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_steps", "decision", "decision_day", "llr_final_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_steps": pd.Series([], dtype=np.int64),
            "decision": pd.Series([], dtype=object),
            "decision_day": pd.Series([], dtype=np.int64),
            "llr_final_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    up = math.log(_SPRT_P1 / _SPRT_P0)
    dn = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        n = sub["n"].to_numpy(np.int64)
        day = sub["day"].to_numpy(np.int64)
        if len(n) < 2:
            continue
        x = (n[1:] > n[:-1]).astype(np.float64)
        llr = np.cumsum(np.where(x > 0.5, up, dn))
        hit1 = np.flatnonzero(llr >= _SPRT_A)
        hit0 = np.flatnonzero(llr <= -_SPRT_A)
        f1 = hit1[0] if len(hit1) else len(llr)
        f0 = hit0[0] if len(hit0) else len(llr)
        if f1 < f0:
            decision, dday = "h1", int(day[1:][f1])
        elif f0 < f1:
            decision, dday = "h0", int(day[1:][f0])
        else:
            decision, dday = "continue", 0
        rows.append(
            (et, np.int64(len(llr)), decision, np.int64(dday),
             np.int64(np.floor(llr[-1] * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_steps": np.int64, "decision_day": np.int64, "llr_final_micro": np.int64}
    )


ORACLES195["events_sprt"] = f"""
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, day, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM daily
),
x AS (
  SELECT event_type, day,
         CASE WHEN n > prev THEN ln({_SPRT_P1} / {_SPRT_P0})
              ELSE ln({1.0 - _SPRT_P1} / {1.0 - _SPRT_P0}) END AS inc
  FROM s WHERE prev IS NOT NULL
),
cum AS (
  SELECT event_type, day,
         sum(inc) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
  FROM x
),
hits AS (
  SELECT event_type,
         min(CASE WHEN llr >= ln(19.0) THEN day END) AS d1,
         min(CASE WHEN llr <= -ln(19.0) THEN day END) AS d0,
         count(*) AS n_steps,
         max(day) AS last_day
  FROM cum GROUP BY 1
),
fin AS (
  SELECT cum.event_type, cum.llr
  FROM cum JOIN hits ON cum.event_type = hits.event_type
  WHERE cum.day = hits.last_day
)
SELECT hits.event_type,
       CAST(hits.n_steps AS BIGINT) AS n_steps,
       CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 < d0) THEN 'h1'
            WHEN d0 IS NOT NULL AND (d1 IS NULL OR d0 < d1) THEN 'h0'
            ELSE 'continue' END AS decision,
       CAST(CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 < d0) THEN d1
                 WHEN d0 IS NOT NULL AND (d1 IS NULL OR d0 < d1) THEN d0
                 ELSE 0 END AS BIGINT) AS decision_day,
       CAST(floor(fin.llr * 1000000.0 + 0.5) AS BIGINT) AS llr_final_micro
FROM hits JOIN fin ON hits.event_type = fin.event_type
ORDER BY hits.event_type"""


QUERIES195 = {
    "events_ipw_ate": q_events_ipw_ate,
    "events_sprt": q_events_sprt,
}
