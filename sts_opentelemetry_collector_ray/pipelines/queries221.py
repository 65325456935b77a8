"""Driver-contract queries, wave 221 — binary transfer entropy between
event-type daily up/down series (plug-in estimator over aligned days,
Schreiber 2000) and the Anderson-Darling normality test of daily counts
(A&S 26.2.17 normal CDF on both sides).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries197 import _phi_upper, _phi_upper_sql

ORACLES221: dict[str, str] = {}


def _daily(sf_dir: str) -> pd.DataFrame:
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
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return part
    return (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )


# ---------------------------------------------------------------------------
# events_transfer_entropy — binary TE over aligned daily up-moves
# ---------------------------------------------------------------------------


def q_events_transfer_entropy(sf_dir: str):
    """Top-3 ordered type pairs X→Y by binary transfer entropy over days
    common to both series: with up-moves u_t = 1{n_t > n_{t−1}} (previous
    COMMON day), TE = Σ_{a,b,c} p(a,b,c)·ln[(c_abc/c_bc)/(c_ab/c_b)] where
    a = y_{t+1}, b = y_t, c = x_t (zero cells contribute 0). Output:
    x_type, y_type, n_triples, te_micro — ORDER BY te DESC, x, y.

    Scale shape: bounded daily fold; the |types|² pair scan over aligned
    series is vectorized on the driver."""
    daily = _daily(sf_dir)
    cols = ["x_type", "y_type", "n_triples", "te_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(np.int64 if c in ("n_triples", "te_micro")
                                 else object)) for c in cols}
    )
    if daily.empty:
        return empty
    series = {
        et: sub.set_index("day")["n"]
        for et, sub in daily.groupby("event_type", sort=True)
    }
    types = sorted(series)
    rows = []
    for xt in types:
        for yt in types:
            if xt == yt:
                continue
            common = series[xt].index.intersection(series[yt].index).sort_values()
            if len(common) < 4:
                continue
            nx = series[xt].loc[common].to_numpy(np.int64)
            ny = series[yt].loc[common].to_numpy(np.int64)
            ux = (nx[1:] > nx[:-1]).astype(np.int64)
            uy = (ny[1:] > ny[:-1]).astype(np.int64)
            a = uy[1:]
            b = uy[:-1]
            c = ux[:-1]
            n = len(a)
            if n < 1:
                continue
            cell = a * 4 + b * 2 + c
            cnt = np.bincount(cell, minlength=8).astype(np.float64)
            te = 0.0
            for aa in (0, 1):
                for bb in (0, 1):
                    for cc in (0, 1):
                        c_abc = cnt[aa * 4 + bb * 2 + cc]
                        if c_abc <= 0.0:
                            continue
                        c_bc = cnt[0 * 4 + bb * 2 + cc] + cnt[1 * 4 + bb * 2 + cc]
                        c_ab = cnt[aa * 4 + bb * 2 + 0] + cnt[aa * 4 + bb * 2 + 1]
                        c_b = (
                            cnt[0 * 4 + bb * 2 + 0] + cnt[0 * 4 + bb * 2 + 1]
                            + cnt[1 * 4 + bb * 2 + 0] + cnt[1 * 4 + bb * 2 + 1]
                        )
                        te += (c_abc / n) * np.log(
                            (c_abc / c_bc) / (c_ab / c_b)
                        )
            rows.append(
                (xt, yt, np.int64(n),
                 np.int64(np.floor(te * 1_000_000.0 + 0.5)))
            )
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=cols)
    df = df.sort_values(
        ["te_micro", "x_type", "y_type"], ascending=[False, True, True],
        kind="mergesort",
    ).head(3)
    return df.reset_index(drop=True).astype(
        {"n_triples": np.int64, "te_micro": np.int64}
    )


ORACLES221["events_transfer_entropy"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT x.event_type AS xt, y.event_type AS yt, x.day,
         x.n AS nx, y.n AS ny
  FROM daily x JOIN daily y ON x.day = y.day AND x.event_type <> y.event_type
),
ups AS (
  SELECT xt, yt, day,
         CASE WHEN nx > lag(nx) OVER w THEN 1 ELSE 0 END AS ux,
         CASE WHEN ny > lag(ny) OVER w THEN 1 ELSE 0 END AS uy,
         row_number() OVER w AS t,
         count(*) OVER (PARTITION BY xt, yt) AS nd
  FROM pairs
  WINDOW w AS (PARTITION BY xt, yt ORDER BY day)
),
trip AS (
  SELECT xt, yt,
         lead(uy) OVER w AS a, uy AS b, ux AS c,
         t, nd
  FROM ups WHERE t >= 2 AND nd >= 4
  WINDOW w AS (PARTITION BY xt, yt ORDER BY day)
),
t2 AS (SELECT xt, yt, a, b, c FROM trip WHERE a IS NOT NULL AND t <= nd - 1),
cnt AS (
  SELECT xt, yt, a, b, c, CAST(count(*) AS DOUBLE) AS n
  FROM t2 GROUP BY 1, 2, 3, 4, 5
),
m AS (
  SELECT xt, yt, a, b, c, n,
         sum(n) OVER (PARTITION BY xt, yt, b, c) AS c_bc,
         sum(n) OVER (PARTITION BY xt, yt, a, b) AS c_ab,
         sum(n) OVER (PARTITION BY xt, yt, b) AS c_b,
         sum(n) OVER (PARTITION BY xt, yt) AS nn
  FROM cnt
),
te AS (
  SELECT xt, yt, CAST(any_value(nn) AS BIGINT) AS n_triples,
         sum((n / nn) * ln((n / c_bc) / (c_ab / c_b))) AS te
  FROM m GROUP BY 1, 2
)
SELECT xt AS x_type, yt AS y_type, n_triples,
       CAST(floor(te * 1000000.0 + 0.5) AS BIGINT) AS te_micro
FROM te ORDER BY te_micro DESC, x_type ASC, y_type ASC LIMIT 3"""


# ---------------------------------------------------------------------------
# events_anderson_darling — normality of daily counts per type
# ---------------------------------------------------------------------------


def q_events_anderson_darling(sf_dir: str):
    """Per event type: the Anderson-Darling A² statistic for normality of
    the daily count series (plug-in μ̂, σ̂; Φ via the shared A&S 26.2.17
    polynomial so both engines evaluate the identical CDF). Output:
    event_type, n_days, a2_micro, reject_5pct (A² > 0.787).

    Scale shape: bounded daily fold + one sorted vectorized pass per
    type — no shuffle."""
    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "a2_micro", "reject_5pct"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = np.sort(sub["n"].to_numpy(np.float64))
        n = len(x)
        if n < 8:
            continue
        mu = x.sum() / n
        sd = np.sqrt(max((x * x).sum() / n - mu * mu, 0.0))
        if sd <= 0.0:
            continue
        z = (x - mu) / sd
        cdf = np.where(z >= 0.0, 1.0 - _phi_upper(np.abs(z)), _phi_upper(np.abs(z)))
        cdf = np.clip(cdf, 1e-12, 1.0 - 1e-12)
        i = np.arange(1, n + 1, dtype=np.float64)
        a2 = -n - ((2.0 * i - 1.0) * (np.log(cdf) + np.log(1.0 - cdf[::-1]))).sum() / n
        rows.append(
            (et, np.int64(n),
             np.int64(np.floor(a2 * 1_000_000.0 + 0.5)),
             np.int64(1 if a2 > 0.787 else 0))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES221["events_anderson_darling"] = f"""
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, sum(x) / count(*) AS mu,
         sqrt(greatest(sum(x * x) / count(*)
              - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0)) AS sd
  FROM daily GROUP BY 1 HAVING count(*) >= 8
),
z AS (
  SELECT daily.event_type, (daily.x - st.mu) / st.sd AS z, st.n
  FROM daily JOIN st ON daily.event_type = st.event_type
  WHERE st.sd > 0.0
),
cdf AS (
  SELECT event_type, n,
         least(greatest(CASE WHEN z >= 0.0
                  THEN 1.0 - {_phi_upper_sql('abs(z)')}
                  ELSE {_phi_upper_sql('abs(z)')} END, 1e-12),
               1.0 - 1e-12) AS f,
         row_number() OVER (PARTITION BY event_type ORDER BY z) AS i
  FROM z
),
j AS (
  SELECT a.event_type, a.n, a.i, a.f AS fi, b.f AS frev
  FROM cdf a JOIN cdf b ON a.event_type = b.event_type
        AND b.i = a.n - a.i + 1
),
a2 AS (
  SELECT event_type, any_value(n) AS n,
         -any_value(n)
         - sum((2.0 * i - 1.0) * (ln(fi) + ln(1.0 - frev))) / any_value(n)
           AS a2
  FROM j GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(a2 * 1000000.0 + 0.5) AS BIGINT) AS a2_micro,
       CAST(CASE WHEN a2 > 0.787 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM a2 ORDER BY event_type"""


QUERIES221 = {
    "events_transfer_entropy": q_events_transfer_entropy,
    "events_anderson_darling": q_events_anderson_darling,
}
