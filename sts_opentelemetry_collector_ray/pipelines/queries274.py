"""Driver-contract queries, wave 274 — the two-sample Cramér-von Mises
statistic between the value distributions of the top-2 event types
(exact ECDF-difference sum over the shared cents histogram) and
Spearman's footrule distance (Diaconis-Graham) between the two types'
daily-count rank sequences. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES274: dict[str, str] = {}

_DAY_US = 86_400_000_000


def _top2_sql() -> str:
    return """
tc AS (
  SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
  FROM events GROUP BY 1
),
top2 AS (SELECT event_type, rk FROM tc WHERE rk <= 2)"""


# ---------------------------------------------------------------------------
# events_cvm_two_sample — ECDF-difference CvM over the cents histogram
# ---------------------------------------------------------------------------


def q_events_cvm_two_sample(sf_dir: str):
    """Two-sample Cramér-von Mises: with the top-2 event types' value
    (cents) histograms a_k / b_k over combined distinct values,
    T = sum_k (a_k + b_k) (m cumA_k - n cumB_k)^2 / (N^2 n m) — the
    numerator is an EXACT integer (HUGEINT in SQL, arbitrary-precision
    here) and T is one division. One row: type_a, type_b, n_a, n_b,
    t_micro.

    Scale shape: per-batch (type, cents) combiners; only the bounded
    distinct-cents histogram reaches the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": np.floor(
                    t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby(["et", "cents"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "cents"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["type_a", "type_b", "n_a", "n_b", "t_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if h.empty:
        return empty
    totals = (
        h.groupby("et")["c"].sum().reset_index()
        .sort_values(["c", "et"], ascending=[False, True])
    )
    if len(totals) < 2:
        return empty
    ta, tb = totals["et"].tolist()[:2]
    ha = h[h["et"] == ta].set_index("cents")["c"]
    hb = h[h["et"] == tb].set_index("cents")["c"]
    vals = np.array(sorted(set(ha.index) | set(hb.index)), np.int64)
    a = ha.reindex(vals).fillna(0).to_numpy(np.int64)
    b = hb.reindex(vals).fillna(0).to_numpy(np.int64)
    n, m = int(a.sum()), int(b.sum())
    if n == 0 or m == 0:
        return empty
    cum_a = np.cumsum(a).astype(object)
    cum_b = np.cumsum(b).astype(object)
    d = m * cum_a - n * cum_b
    num = int(((a + b).astype(object) * d * d).sum())
    N = n + m
    t_stat = float(num) / (float(N) * float(N) * float(n) * float(m))
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(n), np.int64(m),
                np.int64(np.floor(t_stat * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES274["events_cvm_two_sample"] = f"""
WITH {_top2_sql()},
v AS (
  SELECT top2.rk, CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN top2 ON top2.event_type = e.event_type
),
hist AS (
  SELECT cents,
         CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM v GROUP BY 1
),
nn AS (SELECT CAST(sum(a) AS BIGINT) AS n, CAST(sum(b) AS BIGINT) AS m
       FROM hist),
cum AS (
  SELECT cents, a, b,
         CAST(sum(a) OVER (ORDER BY cents) AS HUGEINT) AS ca,
         CAST(sum(b) OVER (ORDER BY cents) AS HUGEINT) AS cb
  FROM hist
),
num AS (
  SELECT CAST(sum(CAST(a + b AS HUGEINT)
                  * (nn.m * ca - nn.n * cb) * (nn.m * ca - nn.n * cb))
              AS HUGEINT) AS num
  FROM cum, nn
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       nn.n AS n_a, nn.m AS n_b,
       CAST(floor(CAST(num.num AS DOUBLE)
                  / (CAST(nn.n + nn.m AS DOUBLE) * CAST(nn.n + nn.m AS DOUBLE)
                     * CAST(nn.n AS DOUBLE) * CAST(nn.m AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS t_micro
FROM nn, num
WHERE nn.n > 0 AND nn.m > 0"""


# ---------------------------------------------------------------------------
# events_spearman_footrule — rank-displacement distance between series
# ---------------------------------------------------------------------------


def q_events_spearman_footrule(sf_dir: str):
    """Spearman's footrule between the top-2 types' zero-filled daily
    series: each series ranked over days with doubled average ranks
    (EXACT integers), D2 = sum_t |R2_a(t) - R2_b(t)| (= 2D), and the
    Diaconis-Graham normalization F = 1 - 3 D / (n^2 - 1) as the single
    float step. One row: type_a, type_b, n_days, d2_stat, f_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "dy": pa.compute.cast(t["ts"], pa.int64()).to_numpy()
                // _DAY_US,
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["dy", "et"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dy", "et"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["type_a", "type_b", "n_days", "d2_stat", "f_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if h.empty:
        return empty
    totals = (
        h.groupby("et")["c"].sum().reset_index()
        .sort_values(["c", "et"], ascending=[False, True])
    )
    if len(totals) < 2:
        return empty
    ta, tb = totals["et"].tolist()[:2]
    d0, d1 = int(h["dy"].min()), int(h["dy"].max())
    n = d1 - d0 + 1
    if n < 2:
        return empty

    def r2_of(name: str) -> np.ndarray:
        y = np.zeros(n, np.int64)
        sub = h[h["et"] == name]
        y[sub["dy"].to_numpy(np.int64) - d0] = sub["c"].to_numpy(np.int64)
        vals, cnts = np.unique(y, return_counts=True)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        r2v = 2 * below + cnts + 1
        return r2v[np.searchsorted(vals, y)]

    ra, rb = r2_of(ta), r2_of(tb)
    d2 = int(np.abs(ra - rb).sum())
    f = 1.0 - 3.0 * (float(d2) / 2.0) / (float(n) * float(n) - 1.0)
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(n), np.int64(d2),
                np.int64(np.floor(f * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES274["events_spearman_footrule"] = f"""
WITH {_top2_sql()},
h AS (
  SELECT epoch_us(e.ts) // {_DAY_US} AS dy, top2.rk,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events e JOIN top2 ON top2.event_type = e.event_type
  GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1
      FROM (SELECT epoch_us(ts) // {_DAY_US} AS dy FROM events)),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
sa AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.dy = grid.dy AND h.rk = 1
),
sb AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.dy = grid.dy AND h.rk = 2
),
ra AS (
  SELECT dy, 2 * (rank() OVER (ORDER BY y)) + (count(*) OVER (PARTITION BY y))
             - 1 AS r2
  FROM sa
),
rb AS (
  SELECT dy, 2 * (rank() OVER (ORDER BY y)) + (count(*) OVER (PARTITION BY y))
             - 1 AS r2
  FROM sb
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(abs(ra.r2 - rb.r2)) AS BIGINT) AS d2
  FROM ra JOIN rb USING (dy)
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       agg.n AS n_days, agg.d2 AS d2_stat,
       CAST(floor((1.0 - 3.0 * (CAST(agg.d2 AS DOUBLE) / 2.0)
                   / (CAST(agg.n AS DOUBLE) * CAST(agg.n AS DOUBLE) - 1.0))
                  * 1000000.0 + 0.5) AS BIGINT) AS f_micro
FROM agg
WHERE agg.n >= 2"""


QUERIES274 = {
    "events_cvm_two_sample": q_events_cvm_two_sample,
    "events_spearman_footrule": q_events_spearman_footrule,
}
