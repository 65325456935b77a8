"""Driver-contract queries, wave 209 — selectivity-estimation audit (the
optimizer's independence assumption vs actual conjunctive selectivity per
predicate pair) and m-of-n sliding-window alert evaluation over daily
counts. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES209: dict[str, str] = {}

_MN_M, _MN_N = 3, 5


# ---------------------------------------------------------------------------
# events_selectivity_audit — independence assumption vs actual
# ---------------------------------------------------------------------------


def q_events_selectivity_audit(sf_dir: str):
    """Optimizer-statistics audit: for every (event_type, day-of-week)
    predicate pair, the independence estimate sel(A)·sel(B) vs the actual
    conjunctive selectivity, and the multiplicative error ln(act/est) in
    micro units (the metric behind 'correlated columns break the planner').
    Top-10 pairs by |ln ratio| (ties → type, dow). Output: event_type, dow,
    n_pair, est_micro, act_micro, lnratio_micro.

    Scale shape: one (type, dow, n) bounded combiner; marginals and the
    grid fold on the driver — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        df["dow"] = ((df["ts"].dt.dayofweek + 1) % 7).astype(np.int64)
        df["n"] = 1
        return df.groupby(["event_type", "dow"], sort=False, as_index=False)[
            "n"
        ].sum().astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "dow", "n_pair", "est_micro", "act_micro", "lnratio_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
             for c in cols}
        )
    g = part.groupby(["event_type", "dow"])["n"].sum()
    n_all = float(g.sum())
    m_type = g.groupby(level=0).sum()
    m_dow = g.groupby(level=1).sum()
    rows = []
    for (et, dow), n_pair in g.items():
        act = n_pair / n_all
        est = (m_type[et] / n_all) * (m_dow[dow] / n_all)
        lr = np.log(act / est)
        rows.append(
            (
                et, np.int64(dow), np.int64(n_pair),
                np.int64(np.floor(est * 1_000_000.0 + 0.5)),
                np.int64(np.floor(act * 1_000_000.0 + 0.5)),
                np.int64(np.floor(lr * 1_000_000.0 + 0.5)),
                abs(lr),
            )
        )
    df = pd.DataFrame(rows, columns=cols + ["_abs"])
    df = df.sort_values(
        ["_abs", "event_type", "dow"], ascending=[False, True, True],
        kind="mergesort",
    ).head(10)
    return df[cols].reset_index(drop=True).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES209["events_selectivity_audit"] = """
WITH c AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS na FROM c),
mt AS (SELECT event_type, sum(n) AS n FROM c GROUP BY 1),
md AS (SELECT dow, sum(n) AS n FROM c GROUP BY 1),
r AS (
  SELECT c.event_type, c.dow, c.n,
         (mt.n / tot.na) * (md.n / tot.na) AS est,
         c.n / tot.na AS act
  FROM c JOIN mt ON c.event_type = mt.event_type
  JOIN md ON c.dow = md.dow, tot
)
SELECT event_type, dow, n AS n_pair,
       CAST(floor(est * 1000000.0 + 0.5) AS BIGINT) AS est_micro,
       CAST(floor(act * 1000000.0 + 0.5) AS BIGINT) AS act_micro,
       CAST(floor(ln(act / est) * 1000000.0 + 0.5) AS BIGINT) AS lnratio_micro
FROM r ORDER BY abs(ln(act / est)) DESC, event_type ASC, dow ASC LIMIT 10"""


# ---------------------------------------------------------------------------
# events_m_of_n_alerts — m-of-n sliding alert evaluation
# ---------------------------------------------------------------------------


def q_events_m_of_n_alerts(sf_dir: str):
    """Per event type: a day raises a BREACH when its count exceeds
    mean + 1σ; an ALERT fires on days where ≥ 3 of the last 5 observed days
    (inclusive) breached (m-of-n debounce, SRE alerting style). Output:
    event_type, n_days, n_breach, n_alerts, first_alert_day (yyyymmdd, 0 if
    none).

    Scale shape: bounded daily fold + one vectorized sliding-sum scan per
    type — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        return (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_days", "n_breach", "n_alerts", "first_alert_day"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = sub["n"].to_numpy(np.float64)
        day = sub["day"].to_numpy(np.int64)
        mean = x.sum() / len(x)
        sd = np.sqrt(max((x * x).sum() / len(x) - mean * mean, 0.0))
        breach = (x > mean + sd).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(breach)])
        lo = np.maximum(np.arange(len(x)) - _MN_N + 1, 0)
        win = cs[1:] - cs[lo]
        alert = win >= _MN_M
        first = int(day[alert][0]) if alert.any() else 0
        rows.append(
            (et, np.int64(len(x)), np.int64(int(breach.sum())),
             np.int64(int(alert.sum())), np.int64(first))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES209["events_m_of_n_alerts"] = f"""
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, sum(n) / count(*) AS mu,
         sqrt(greatest(sum(n * n) / count(*)
              - (sum(n) / count(*)) * (sum(n) / count(*)), 0.0)) AS sd
  FROM daily GROUP BY 1
),
b AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.n > st.mu + st.sd THEN 1 ELSE 0 END AS breach
  FROM daily JOIN st ON daily.event_type = st.event_type
),
w AS (
  SELECT event_type, day, breach,
         sum(breach) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN {_MN_N - 1} PRECEDING AND CURRENT ROW)
           AS win
  FROM b
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(breach) AS BIGINT) AS n_breach,
       CAST(sum(CASE WHEN win >= {_MN_M} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alerts,
       CAST(coalesce(min(CASE WHEN win >= {_MN_M} THEN day END), 0) AS BIGINT)
         AS first_alert_day
FROM w GROUP BY 1 ORDER BY 1"""


QUERIES209 = {
    "events_selectivity_audit": q_events_selectivity_audit,
    "events_m_of_n_alerts": q_events_m_of_n_alerts,
}
