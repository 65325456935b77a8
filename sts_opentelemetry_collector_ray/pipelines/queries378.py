"""Driver-contract queries, wave 378 — Kaplan-Meier survival of the
per-user time-to-next-event with right censoring at the corpus end
(probed at 1min/1h/1day via deterministic ordered log-folds) and the
top additive-model residuals of the event_type x hour mean-value
surface. Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES378: dict[str, str] = {}

_KM_BUCKETS = 64
_HOUR_US = 3_600_000_000
_PROBES = (60_000_000, 3_600_000_000, 86_400_000_000)


# ---------------------------------------------------------------------------
# users_km_survival — Kaplan-Meier with right censoring
# ---------------------------------------------------------------------------


def q_users_km_survival(sf_dir: str):
    """Kaplan-Meier: per-user inter-event gaps are observed events;
    each user's final wait (corpus max ts - last event) is censored.
    At-risk counts are exact integers (N - cumulative exits before t);
    S(probe) = exp(fold of ln(1 - d/n) over death times <= probe, in
    ascending time) — the fold is a sequential left fold on BOTH
    sides. One row: n_gaps_obs, n_censored, s_1min_micro, s_1h_micro,
    s_1day_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["_b"] = (df["u"] % _KM_BUCKETS).astype(np.int64)
        return df

    raw = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    max_ts = int(
        raw.map_batches(
            lambda df: pd.DataFrame({"m": [np.int64(df["ts"].max())]}),
            batch_format="pandas",
        )
        .to_pandas()["m"]
        .max()
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "t": pd.Series([], dtype=np.int64),
                "d": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        last = pd.Series(ts).groupby(u).max()
        cens = max_ts - last.to_numpy(np.int64)
        dh = pd.Series(gaps).groupby(gaps).size()
        ch = pd.Series(cens).groupby(cens).size()
        out = pd.DataFrame(
            {
                "t": np.concatenate(
                    [dh.index.to_numpy(np.int64),
                     ch.index.to_numpy(np.int64)]
                ),
                "d": np.concatenate(
                    [dh.to_numpy(np.int64),
                     np.zeros(len(ch), np.int64)]
                ),
                "c": np.concatenate(
                    [np.zeros(len(dh), np.int64),
                     ch.to_numpy(np.int64)]
                ),
            }
        )
        return out.groupby("t", as_index=False).sum().astype(np.int64)

    tab = (
        raw.groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("t")[["d", "c"]]
        .sum()
        .sort_index()
    )
    cols = ["n_gaps_obs", "n_censored", "s_1min_micro", "s_1h_micro",
            "s_1day_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if tab.empty:
        return empty
    t_v = tab.index.to_numpy(np.int64)
    d_v = tab["d"].to_numpy(np.int64)
    c_v = tab["c"].to_numpy(np.int64)
    n_obs = int(d_v.sum())
    n_cen = int(c_v.sum())
    total = n_obs + n_cen
    if n_obs == 0:
        return empty
    exits = np.cumsum(d_v + c_v)
    at_risk = total - np.concatenate([[0], exits[:-1]])
    probes_s = []
    for probe in _PROBES:
        acc = 0.0
        for tv, dv, nv in zip(t_v, d_v, at_risk):
            if int(tv) > probe:
                break
            if int(dv) == 0 or int(nv) <= 0:
                continue
            acc = acc + float(
                np.log(1.0 - float(int(dv)) / float(int(nv)))
            )
        probes_s.append(float(np.exp(acc)))
    return pd.DataFrame(
        [
            (
                np.int64(n_obs), np.int64(n_cen),
                *[np.int64(np.floor(s * 1_000_000.0 + 0.5))
                  for s in probes_s],
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES378["users_km_survival"] = f"""
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
deaths AS (
  SELECT CAST(gap AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS d
  FROM seq WHERE gap IS NOT NULL GROUP BY 1
),
cens AS (
  SELECT CAST(mx.m - last AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS c
  FROM (SELECT user_id, max(epoch_us(ts)) AS last
        FROM events GROUP BY 1), mx
  GROUP BY 1
),
tab AS (
  SELECT t, CAST(sum(d) AS BIGINT) AS d, CAST(sum(c) AS BIGINT) AS c
  FROM (
    SELECT t, d, 0 AS c FROM deaths
    UNION ALL SELECT t, 0, c FROM cens
  )
  GROUP BY 1
),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS nd,
               CAST(sum(c) AS BIGINT) AS nc FROM tab),
risk AS (
  SELECT t, d,
         tot.n - coalesce(sum(d + c) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS n_at
  FROM tab, tot
),
lnf AS (
  SELECT t, ln(1.0 - CAST(d AS DOUBLE) / n_at) AS lf
  FROM risk WHERE d > 0 AND n_at > 0
),
s AS (
  SELECT
    exp(coalesce((SELECT list_reduce(list_prepend(0.0,
           list(lf ORDER BY t)), (a, b) -> a + b)
         FROM lnf WHERE t <= {_PROBES[0]}), 0.0)) AS s1,
    exp(coalesce((SELECT list_reduce(list_prepend(0.0,
           list(lf ORDER BY t)), (a, b) -> a + b)
         FROM lnf WHERE t <= {_PROBES[1]}), 0.0)) AS s2,
    exp(coalesce((SELECT list_reduce(list_prepend(0.0,
           list(lf ORDER BY t)), (a, b) -> a + b)
         FROM lnf WHERE t <= {_PROBES[2]}), 0.0)) AS s3
)
SELECT tot.nd AS n_gaps_obs, tot.nc AS n_censored,
       CAST(floor(s.s1 * 1000000.0 + 0.5) AS BIGINT) AS s_1min_micro,
       CAST(floor(s.s2 * 1000000.0 + 0.5) AS BIGINT) AS s_1h_micro,
       CAST(floor(s.s3 * 1000000.0 + 0.5) AS BIGINT) AS s_1day_micro
FROM tot, s
WHERE tot.nd > 0"""


# ---------------------------------------------------------------------------
# events_type_hour_residuals — additive-model heatmap extremes
# ---------------------------------------------------------------------------


def q_events_type_hour_residuals(sf_dir: str):
    """Interaction hotspots: the (event_type, hour-of-day) mean-value
    surface minus the additive fit grand + row-effect + col-effect
    (cell means weighted by counts, folds ordered by type then hour).
    Top-5 cells by |residual| (ties by type, hour). Per cell:
    event_type, hr, n, resid_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        hr = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        ) % 24
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"et": et, "hr": hr, "n": 1, "s": cents})
            .groupby(["et", "hr"], as_index=False)
            .sum()
        )
        return g

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "hr"])[["n", "s"]]
        .sum()
        .reset_index()
        .sort_values(["et", "hr"])
    )
    cols = ["event_type", "hr", "n", "resid_milli"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "hr": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "resid_milli": pd.Series([], dtype=np.int64),
        }
    )
    if cells.empty:
        return empty
    n_tot = int(cells["n"].sum())
    s_tot = int(cells["s"].sum())
    grand = float(s_tot) / float(n_tot)
    row = cells.groupby("et")[["n", "s"]].sum()
    col = cells.groupby("hr")[["n", "s"]].sum()
    row_m = {i: float(int(r["s"])) / float(int(r["n"]))
             for i, r in row.iterrows()}
    col_m = {i: float(int(r["s"])) / float(int(r["n"]))
             for i, r in col.iterrows()}
    recs = []
    for _, r in cells.iterrows():
        m = float(int(r["s"])) / float(int(r["n"]))
        resid = m - (row_m[r["et"]] + col_m[int(r["hr"])] - grand)
        recs.append((r["et"], int(r["hr"]), int(r["n"]), resid))
    recs.sort(key=lambda x: (-abs(x[3]), x[0], x[1]))
    top = recs[:5]
    return pd.DataFrame(
        [
            (
                et, np.int64(hr), np.int64(n),
                np.int64(np.floor(resid / 100.0 * 1_000.0 + 0.5)),
            )
            for et, hr, n, resid in top
        ],
        columns=cols,
    ).astype({"hr": np.int64, "n": np.int64, "resid_milli": np.int64})


ORACLES378["events_type_hour_residuals"] = f"""
WITH b AS (
  SELECT event_type AS et,
         CAST((epoch_us(ts) // {_HOUR_US}) % 24 AS BIGINT) AS hr,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
),
cells AS (
  SELECT et, hr, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s
  FROM b GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS s FROM cells),
rowm AS (
  SELECT et, CAST(sum(s) AS DOUBLE) / sum(n) AS m FROM cells GROUP BY 1
),
colm AS (
  SELECT hr, CAST(sum(s) AS DOUBLE) / sum(n) AS m FROM cells GROUP BY 1
),
resid AS (
  SELECT cells.et, cells.hr, cells.n,
         CAST(cells.s AS DOUBLE) / cells.n
           - (rowm.m + colm.m - CAST(tot.s AS DOUBLE) / tot.n) AS r
  FROM cells JOIN rowm USING (et) JOIN colm USING (hr), tot
),
ranked AS (
  SELECT et, hr, n, r,
         row_number() OVER (ORDER BY abs(r) DESC, et, hr) AS rk
  FROM resid
)
SELECT et AS event_type, hr, n,
       CAST(floor(r / 100.0 * 1000.0 + 0.5) AS BIGINT) AS resid_milli
FROM ranked
WHERE rk <= 5
ORDER BY rk"""


QUERIES378 = {
    "users_km_survival": q_users_km_survival,
    "events_type_hour_residuals": q_events_type_hour_residuals,
}
