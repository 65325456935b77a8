"""Driver-contract queries, wave 389 — market-segment diversity within
nations (Shannon + Simpson + evenness) and the seasonality strength
(eta-squared) of the weekday and hour-of-day factors on event counts.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES389: dict[str, str] = {}

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# customer_nation_segment_diversity — diversity indices per nation
# ---------------------------------------------------------------------------


def q_customer_nation_segment_diversity(sf_dir: str):
    """How mixed is each nation's customer base across market
    segments? Shannon entropy (ln N - S/N with S = sum c ln c),
    Simpson concentration (exact integer core sum c(c-1)/(N(N-1))),
    and evenness H/ln(k). Per nation: nationkey, n, n_segments,
    shannon_milli, simpson_micro, evenness_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "nk": t["c_nationkey"].to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64),
                    "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["nk", "seg"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    table = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_nationkey", "c_mktsegment"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["nk", "seg"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["nationkey", "n", "n_segments", "shannon_milli",
            "simpson_micro", "evenness_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if table.empty:
        return empty
    rows = []
    for nk in sorted(table["nk"].unique()):
        sub = table[table["nk"] == nk]
        c = sub["c"].to_numpy(np.int64).astype(object)
        n = int(c.sum())
        k = len(c)
        if n < 2 or k < 2:
            continue
        s = float(
            (c.astype(np.int64).astype(np.float64)
             * np.log(c.astype(np.int64).astype(np.float64))).sum()
        )
        h = float(np.log(float(n))) - s / float(n)
        simpson_num = int((c * (c - 1)).sum())
        simpson = float(simpson_num) / (float(n) * float(n - 1))
        even = h / float(np.log(float(k)))
        rows.append(
            (
                np.int64(int(nk)), np.int64(n), np.int64(k),
                np.int64(np.floor(h * 1_000.0 + 0.5)),
                np.int64(np.floor(simpson * 1_000_000.0 + 0.5)),
                np.int64(np.floor(even * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES389["customer_nation_segment_diversity"] = """
WITH t AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2
),
agg AS (
  SELECT nk, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s,
         CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS sim
  FROM t GROUP BY 1
),
f AS (
  SELECT nk, n, k,
         ln(CAST(n AS DOUBLE)) - s / n AS h,
         CAST(sim AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS simpson
  FROM agg
  WHERE n >= 2 AND k >= 2
)
SELECT CAST(nk AS BIGINT) AS nationkey, n, k AS n_segments,
       CAST(floor(h * 1000.0 + 0.5) AS BIGINT) AS shannon_milli,
       CAST(floor(simpson * 1000000.0 + 0.5) AS BIGINT)
         AS simpson_micro,
       CAST(floor(h / ln(CAST(k AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS evenness_micro
FROM f
ORDER BY nationkey"""


# ---------------------------------------------------------------------------
# events_seasonality_eta — eta-squared of weekday and hour
# ---------------------------------------------------------------------------


def q_events_seasonality_eta(sf_dir: str):
    """How much of hourly-count variance do the calendar factors
    explain? On the zero-filled hourly series, eta^2 =
    SS_between / SS_total for (a) the epoch-weekday factor and (b)
    the hour-of-day factor — exact integer cores (group sums), the
    rational Sum Sg^2/n_g folded in group order. One row: n_hours,
    eta2_weekday_micro, eta2_hour_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hr).groupby(hr).size()
        return pd.DataFrame(
            {"hr": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hours = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["c"]
        .sum()
    )
    cols = ["n_hours", "eta2_weekday_micro", "eta2_hour_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hours.empty:
        return empty
    h0, h1 = int(hours.index.min()), int(hours.index.max())
    n = h1 - h0 + 1
    if n < 336:
        return empty
    y = np.zeros(n, np.int64)
    y[hours.index.to_numpy(np.int64) - h0] = hours.to_numpy(np.int64)
    abs_hr = np.arange(h0, h1 + 1, dtype=np.int64)
    yo = y.astype(object)
    s = int(yo.sum())
    s2 = int((yo * yo).sum())
    ss_total = float(s2) - float(s) * float(s) / float(n)
    if ss_total <= 0.0:
        return empty

    def eta2(groups: np.ndarray) -> float:
        df = pd.DataFrame({"g": groups, "y": y})
        agg = df.groupby("g")["y"].agg(["sum", "size"]).sort_index()
        fold = 0.0
        for _, r in agg.iterrows():
            sg, m = int(r["sum"]), int(r["size"])
            fold = fold + float(sg) * float(sg) / float(m)
        ssb = fold - float(s) * float(s) / float(n)
        return ssb / ss_total

    wd = ((abs_hr // 24) % 7).astype(np.int64)
    hod = (abs_hr % 24).astype(np.int64)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(eta2(wd) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(eta2(hod) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES389["events_seasonality_eta"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
x AS (
  SELECT g.h0 + CAST(r.range AS BIGINT) AS ah,
         CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM g CROSS JOIN range(0, 500000) r
  LEFT JOIN h ON h.hr = g.h0 + CAST(r.range AS BIGINT)
  WHERE r.range <= g.h1 - g.h0
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
wdg AS (
  SELECT (ah // 24) % 7 AS grp, CAST(sum(y) AS BIGINT) AS sg,
         CAST(count(*) AS BIGINT) AS m
  FROM x GROUP BY 1
),
hodg AS (
  SELECT ah % 24 AS grp, CAST(sum(y) AS BIGINT) AS sg,
         CAST(count(*) AS BIGINT) AS m
  FROM x GROUP BY 1
),
wfold AS (
  SELECT list_reduce(list_prepend(0.0,
           list(CAST(sg AS DOUBLE) * sg / m ORDER BY grp)),
           (a, b) -> a + b) AS f
  FROM wdg
),
hfold AS (
  SELECT list_reduce(list_prepend(0.0,
           list(CAST(sg AS DOUBLE) * sg / m ORDER BY grp)),
           (a, b) -> a + b) AS f
  FROM hodg
),
tot AS (
  SELECT nn.n,
         CAST(nn.s2 AS DOUBLE) - CAST(nn.s AS DOUBLE) * nn.s / nn.n
           AS sst,
         CAST(nn.s AS DOUBLE) * nn.s / nn.n AS corr
  FROM nn
)
SELECT tot.n AS n_hours,
       CAST(floor((wfold.f - tot.corr) / tot.sst * 1000000.0 + 0.5)
            AS BIGINT) AS eta2_weekday_micro,
       CAST(floor((hfold.f - tot.corr) / tot.sst * 1000000.0 + 0.5)
            AS BIGINT) AS eta2_hour_micro
FROM tot, wfold, hfold
WHERE tot.n >= 336 AND tot.sst > 0"""


QUERIES389 = {
    "customer_nation_segment_diversity": q_customer_nation_segment_diversity,
    "events_seasonality_eta": q_events_seasonality_eta,
}
