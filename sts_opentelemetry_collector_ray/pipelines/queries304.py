"""Driver-contract queries, wave 304 — the X-bar/R control chart over
calendar-week subgroups of the daily event series (Shewhart constants
for n = 7) and robust octile shape statistics of lineitem prices:
Bowley quartile skewness and Moors kurtosis (exact order statistics).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES304: dict[str, str] = {}

_DAY_US = 86_400_000_000
_A2_7 = 0.419
_D3_7 = 0.076
_D4_7 = 1.924


# ---------------------------------------------------------------------------
# events_xbar_r_chart — Shewhart control limits over weekly subgroups
# ---------------------------------------------------------------------------


def q_events_xbar_r_chart(sf_dir: str):
    """Shewhart X-bar/R chart with calendar-week subgroups (complete
    7-day weeks): subgroup means and ranges are EXACT (scaled x7 for
    the mean), limits use the n = 7 constants A2 = 0.419, D3 = 0.076,
    D4 = 1.924, and weeks outside the limits are counted. One row:
    n_weeks, grand_sum, rbar_milli, n_oob_xbar, n_oob_r — the SPC view
    of weekly stability."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_weeks", "grand_sum", "rbar_milli", "n_oob_xbar", "n_oob_r"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    d0 = int(days.index.min())
    dy = d0 + np.arange(len(y), dtype=np.int64)
    df = pd.DataFrame({"wk": dy // 7, "y": y})
    sizes = df.groupby("wk")["wk"].transform("size")
    df = df[sizes == 7]
    if df["wk"].nunique() < 2:
        return empty
    g = df.groupby("wk")["y"].agg(["sum", "min", "max"])
    b = int(len(g))
    sums = g["sum"].to_numpy(np.int64)  # 7 * subgroup mean
    rng = (g["max"] - g["min"]).to_numpy(np.int64)
    grand_sum = int(sums.sum())
    rbar = float(int(rng.sum())) / float(b)
    xbar_bar = float(grand_sum) / (7.0 * float(b))
    ucl_x = xbar_bar + _A2_7 * rbar
    lcl_x = xbar_bar - _A2_7 * rbar
    ucl_r = _D4_7 * rbar
    lcl_r = _D3_7 * rbar
    means = sums.astype(np.float64) / 7.0
    oob_x = int(((means > ucl_x) | (means < lcl_x)).sum())
    rf = rng.astype(np.float64)
    oob_r = int(((rf > ucl_r) | (rf < lcl_r)).sum())
    return pd.DataFrame(
        [
            (
                np.int64(b), np.int64(grand_sum),
                np.int64(np.floor(rbar * 1_000.0 + 0.5)),
                np.int64(oob_x), np.int64(oob_r),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES304["events_xbar_r_chart"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy // 7 AS wk, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
full_wk AS (SELECT wk FROM x GROUP BY wk HAVING count(*) = 7),
sub AS (
  SELECT x.wk, CAST(sum(x.y) AS BIGINT) AS s,
         CAST(max(x.y) - min(x.y) AS BIGINT) AS r
  FROM x JOIN full_wk USING (wk)
  GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(s) AS BIGINT) AS gs,
         CAST(sum(r) AS DOUBLE) / count(*) AS rbar
  FROM sub
),
lim AS (
  SELECT b, gs, rbar,
         CAST(gs AS DOUBLE) / (7.0 * b) + {_A2_7} * rbar AS ucl_x,
         CAST(gs AS DOUBLE) / (7.0 * b) - {_A2_7} * rbar AS lcl_x,
         {_D4_7} * rbar AS ucl_r, {_D3_7} * rbar AS lcl_r
  FROM m
)
SELECT lim.b AS n_weeks, lim.gs AS grand_sum,
       CAST(floor(lim.rbar * 1000.0 + 0.5) AS BIGINT) AS rbar_milli,
       CAST(sum(CASE WHEN CAST(sub.s AS DOUBLE) / 7.0 > lim.ucl_x
                      OR CAST(sub.s AS DOUBLE) / 7.0 < lim.lcl_x
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oob_xbar,
       CAST(sum(CASE WHEN CAST(sub.r AS DOUBLE) > lim.ucl_r
                      OR CAST(sub.r AS DOUBLE) < lim.lcl_r
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oob_r
FROM sub, lim
GROUP BY 1, 2, 3
HAVING lim.b >= 2"""


# ---------------------------------------------------------------------------
# lineitem_bowley_moors — robust octile shape per return flag
# ---------------------------------------------------------------------------


def q_lineitem_bowley_moors(sf_dir: str):
    """Robust shape from exact octiles of extendedprice cents per
    return flag: with E_i the i/8 order statistics
    (k = ceil(i n / 8), lower convention), Bowley skewness =
    (E6 + E2 - 2 E4) / (E6 - E2) and Moors kurtosis =
    ((E7 - E5) + (E3 - E1)) / (E6 - E2). Order statistics come exactly
    off the cents histogram; two divisions. Per flag: l_returnflag, n,
    bowley_micro, moors_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {"f": t["l_returnflag"].to_numpy(zero_copy_only=False), "y": cents}
        )
        g = df.groupby(["f", "y"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["f", "y"])["c"]
        .sum()
    )
    cols = ["l_returnflag", "n", "bowley_micro", "moors_micro"]
    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if h.empty:
        return empty
    rows = []
    for f in sorted(set(h.index.get_level_values(0))):
        sub = h.loc[f].sort_index()
        y = sub.index.to_numpy(np.int64)
        c = sub.to_numpy(np.int64)
        n = int(c.sum())
        if n < 8:
            continue
        cum = np.cumsum(c)

        def oct_(i: int) -> int:
            k = (i * n + 7) // 8  # ceil(i n / 8)
            return int(y[int(np.searchsorted(cum, k, side="left"))])

        e = {i: oct_(i) for i in (1, 2, 3, 4, 5, 6, 7)}
        iqr = e[6] - e[2]
        if iqr == 0:
            continue
        bowley = float(e[6] + e[2] - 2 * e[4]) / float(iqr)
        moors = float((e[7] - e[5]) + (e[3] - e[1])) / float(iqr)
        rows.append(
            (
                f, np.int64(n),
                np.int64(np.floor(bowley * 1_000_000.0 + 0.5)),
                np.int64(np.floor(moors * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES304["lineitem_bowley_moors"] = """
WITH b AS (
  SELECT l_returnflag AS f,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
h AS (SELECT f, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
nn AS (SELECT f, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
cum AS (
  SELECT f, y, sum(c) OVER (PARTITION BY f ORDER BY y) AS cc FROM h
),
octs AS (
  SELECT nn.f, CAST(o.i AS BIGINT) AS i, min(cum.y) AS e
  FROM nn, (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS i) o
  JOIN cum ON cum.f = nn.f AND cum.cc >= (o.i * nn.n + 7) // 8
  GROUP BY 1, 2
),
p AS (
  SELECT f,
         max(CASE WHEN i = 1 THEN e END) AS e1,
         max(CASE WHEN i = 2 THEN e END) AS e2,
         max(CASE WHEN i = 3 THEN e END) AS e3,
         max(CASE WHEN i = 4 THEN e END) AS e4,
         max(CASE WHEN i = 5 THEN e END) AS e5,
         max(CASE WHEN i = 6 THEN e END) AS e6,
         max(CASE WHEN i = 7 THEN e END) AS e7
  FROM octs GROUP BY 1
)
SELECT p.f AS l_returnflag, nn.n,
       CAST(floor(CAST(p.e6 + p.e2 - 2 * p.e4 AS DOUBLE)
                  / CAST(p.e6 - p.e2 AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS bowley_micro,
       CAST(floor(CAST((p.e7 - p.e5) + (p.e3 - p.e1) AS DOUBLE)
                  / CAST(p.e6 - p.e2 AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS moors_micro
FROM p JOIN nn USING (f)
WHERE nn.n >= 8 AND p.e6 - p.e2 <> 0
ORDER BY l_returnflag"""


QUERIES304 = {
    "events_xbar_r_chart": q_events_xbar_r_chart,
    "lineitem_bowley_moors": q_lineitem_bowley_moors,
}
