"""Driver-contract queries, wave 229 — Dickey-Fuller unit-root test on the
daily count series (Δy ~ y_{t−1} OLS with intercept, t-statistic) and the
ABC-class transition matrix of parts between the first and last shipping
year. Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES229: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_dickey_fuller — unit-root t-test per type
# ---------------------------------------------------------------------------


def q_events_dickey_fuller(sf_dir: str):
    """Per event type: the (non-augmented) Dickey-Fuller regression
    Δy_t = α + β·y_{t−1} + ε over daily counts; t = β/se(β) with
    se² = (SSE/(n−2))/Sxx_c; stationary flag at t < −2.86 (5% critical
    value). Output: event_type, n_obs, beta_micro, df_t_micro, stationary.

    Scale shape: bounded daily fold + scalar OLS on the driver — no
    shuffle."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_obs", "beta_micro", "df_t_micro", "stationary"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        if len(y) < 6:
            continue
        dy = y[1:] - y[:-1]
        x = y[:-1]
        n = float(len(dy))
        sx, sy = x.sum(), dy.sum()
        sxx = (x * x).sum()
        sxy = (x * dy).sum()
        syy = (dy * dy).sum()
        sxx_c = sxx - sx * sx / n
        sxy_c = sxy - sx * sy / n
        syy_c = syy - sy * sy / n
        if sxx_c <= 0.0:
            continue
        b = sxy_c / sxx_c
        sse = syy_c - b * sxy_c
        if sse <= 0.0 or n <= 2.0:
            continue
        se = np.sqrt((sse / (n - 2.0)) / sxx_c)
        t = b / se
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(n), micro(b), micro(t),
             np.int64(1 if t < -2.86 else 0))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES229["events_dickey_fuller"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, y - lag(y) OVER w AS dy, lag(y) OVER w AS x
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
pts AS (SELECT event_type, dy, x FROM lagged WHERE x IS NOT NULL),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(dy) AS sy, sum(x * x) AS sxx,
         sum(x * dy) AS sxy, sum(dy * dy) AS syy
  FROM pts GROUP BY 1 HAVING count(*) >= 5
),
c AS (
  SELECT event_type, n,
         sxx - sx * sx / n AS sxxc, sxy - sx * sy / n AS sxyc,
         syy - sy * sy / n AS syyc
  FROM m
),
f AS (
  SELECT event_type, n, sxyc / sxxc AS b,
         syyc - (sxyc / sxxc) * sxyc AS sse, sxxc
  FROM c WHERE sxxc > 0.0
)
SELECT event_type, CAST(n AS BIGINT) AS n_obs,
       CAST(floor(b * 1000000.0 + 0.5) AS BIGINT) AS beta_micro,
       CAST(floor(b / sqrt((sse / (n - 2.0)) / sxxc) * 1000000.0 + 0.5)
            AS BIGINT) AS df_t_micro,
       CAST(CASE WHEN b / sqrt((sse / (n - 2.0)) / sxxc) < -2.86
                 THEN 1 ELSE 0 END AS BIGINT) AS stationary
FROM f WHERE sse > 0.0 AND n > 2.0 ORDER BY event_type"""


# ---------------------------------------------------------------------------
# parts_abc_transitions — ABC class movement between first and last year
# ---------------------------------------------------------------------------


def q_parts_abc_transitions(sf_dir: str):
    """ABC dynamics: classify parts by revenue within the FIRST and LAST
    shipping year (revenue DESC, partkey ASC; cumulative share ≤ 0.8 → A,
    ≤ 0.95 → B, else C; parts absent in a year → 'N'), then count the
    class-transition matrix. Output: class_from, class_to, n_parts.

    Scale shape: a (year, part, Σrev) combiner folds the dimension-sized
    part table twice; ranking and the 4×4 matrix on the driver."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]).to_pandas()
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        yr = df["l_shipdate"].dt.year.to_numpy(np.int64)
        out = pd.DataFrame(
            {"yr": yr, "pk": df["l_partkey"].to_numpy(np.int64), "rev": rev}
        )
        return out.groupby(["yr", "pk"], sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            path,
            columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["class_from", "class_to", "n_parts"]
    if part.empty:
        return pd.DataFrame(
            {"class_from": pd.Series([], dtype=object),
             "class_to": pd.Series([], dtype=object),
             "n_parts": pd.Series([], dtype=np.int64)}
        )
    g = part.groupby(["yr", "pk"])["rev"].sum().reset_index()
    y0, y1 = int(g["yr"].min()), int(g["yr"].max())

    def classify(yr):
        sub = g[g["yr"] == yr].sort_values(
            ["rev", "pk"], ascending=[False, True], kind="mergesort"
        )
        tot = sub["rev"].sum()
        cum = np.cumsum(sub["rev"].to_numpy(np.float64)) / tot
        cls = np.where(cum <= 0.8, "A", np.where(cum <= 0.95, "B", "C"))
        return pd.Series(cls, index=sub["pk"].to_numpy(np.int64))

    c0 = classify(y0)
    c1 = classify(y1)
    allp = np.union1d(c0.index.to_numpy(), c1.index.to_numpy())
    f = c0.reindex(allp).fillna("N").to_numpy(object)
    t_ = c1.reindex(allp).fillna("N").to_numpy(object)
    out = (
        pd.DataFrame({"class_from": f, "class_to": t_, "n_parts": 1})
        .groupby(["class_from", "class_to"], as_index=False)
        .sum()
        .astype({"n_parts": np.int64})
    )
    return out.sort_values(["class_from", "class_to"], kind="mergesort").reset_index(
        drop=True
    )


ORACLES229["parts_abc_transitions"] = """
WITH rev AS (
  SELECT year(l_shipdate) AS yr, l_partkey AS pk,
         sum(l_extendedprice * (1.0 - l_discount)) AS rev
  FROM lineitem GROUP BY 1, 2
),
yy AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM rev),
cls AS (
  SELECT yr, pk,
         CASE WHEN cum <= 0.8 THEN 'A'
              WHEN cum <= 0.95 THEN 'B' ELSE 'C' END AS cls
  FROM (
    SELECT yr, pk,
           sum(rev) OVER (PARTITION BY yr ORDER BY rev DESC, pk ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / sum(rev) OVER (PARTITION BY yr) AS cum
    FROM rev
  )
),
c0 AS (SELECT pk, cls FROM cls, yy WHERE yr = y0),
c1 AS (SELECT pk, cls FROM cls, yy WHERE yr = y1),
allp AS (SELECT pk FROM c0 UNION SELECT pk FROM c1),
tr AS (
  SELECT coalesce(c0.cls, 'N') AS class_from,
         coalesce(c1.cls, 'N') AS class_to
  FROM allp LEFT JOIN c0 ON allp.pk = c0.pk LEFT JOIN c1 ON allp.pk = c1.pk
)
SELECT class_from, class_to, CAST(count(*) AS BIGINT) AS n_parts
FROM tr GROUP BY 1, 2 ORDER BY 1, 2"""


QUERIES229 = {
    "events_dickey_fuller": q_events_dickey_fuller,
    "parts_abc_transitions": q_parts_abc_transitions,
}
