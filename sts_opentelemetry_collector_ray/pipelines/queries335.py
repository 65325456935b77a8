"""Driver-contract queries, wave 335 — the quantile rank-shift audit
(do event types order the same at the median and the P90 of value?) and
the Double Jeopardy law over brands (small-penetration brands also get
bought less often). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES335: dict[str, str] = {}

_DJ_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_type_quantile_rank_shift — P50 vs P90 ordering of types
# ---------------------------------------------------------------------------


def q_events_type_quantile_rank_shift(sf_dir: str):
    """Tail heterogeneity: per type the exact P50 and P90 value order
    statistics (k = ceil(q n), cents histogram); count type pairs whose
    ORDER differs between the two quantiles (discordant after dropping
    pairs tied at either level). Pure integer comparisons. One row:
    n_types, n_pairs, n_discordant, n_tied, agree_micro."""

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
    )
    cols = ["n_types", "n_pairs", "n_discordant", "n_tied", "agree_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    types = sorted(set(h.index.get_level_values(0)))
    if len(types) < 2:
        return empty
    q50 = {}
    q90 = {}
    for t_ in types:
        sub = h.loc[t_].sort_index()
        v = sub.index.to_numpy(np.int64)
        c = sub.to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        k50 = (n + 1) // 2
        k90 = (9 * n + 9) // 10
        q50[t_] = int(v[int(np.searchsorted(cum, k50, side="left"))])
        q90[t_] = int(v[int(np.searchsorted(cum, k90, side="left"))])
    pairs = 0
    disc = 0
    tied = 0
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            pairs += 1
            d50 = q50[a] - q50[b]
            d90 = q90[a] - q90[b]
            if d50 == 0 or d90 == 0:
                tied += 1
            elif (d50 > 0) != (d90 > 0):
                disc += 1
    comp = pairs - tied
    agree = (
        float(comp - disc) / float(comp) if comp > 0 else 1.0
    )
    return pd.DataFrame(
        [
            (
                np.int64(len(types)), np.int64(pairs), np.int64(disc),
                np.int64(tied),
                np.int64(np.floor(agree * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES335["events_type_quantile_rank_shift"] = """
WITH b AS (
  SELECT event_type AS et,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
h AS (SELECT et, cents, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
nn AS (SELECT et, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
cum AS (
  SELECT et, cents, sum(c) OVER (PARTITION BY et ORDER BY cents) AS cc
  FROM h
),
qs AS (
  SELECT nn.et,
         (SELECT min(cents) FROM cum
          WHERE cum.et = nn.et AND cum.cc >= (nn.n + 1) // 2) AS q50,
         (SELECT min(cents) FROM cum
          WHERE cum.et = nn.et AND cum.cc >= (9 * nn.n + 9) // 10) AS q90
  FROM nn
),
pairs AS (
  SELECT a.q50 - b.q50 AS d50, a.q90 - b.q90 AS d90
  FROM qs a JOIN qs b ON a.et < b.et
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS pairs,
         CAST(sum(CASE WHEN d50 = 0 OR d90 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tied,
         CAST(sum(CASE WHEN d50 <> 0 AND d90 <> 0
                        AND ((d50 > 0) <> (d90 > 0))
                       THEN 1 ELSE 0 END) AS BIGINT) AS disc
  FROM pairs
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS k FROM nn)
SELECT nt.k AS n_types, agg.pairs AS n_pairs, agg.disc AS n_discordant,
       agg.tied AS n_tied,
       CAST(floor(CASE WHEN agg.pairs - agg.tied > 0
                       THEN CAST(agg.pairs - agg.tied - agg.disc AS DOUBLE)
                            / (agg.pairs - agg.tied)
                       ELSE 1.0 END * 1000000.0 + 0.5) AS BIGINT)
         AS agree_micro
FROM agg, nt
WHERE nt.k >= 2"""


# ---------------------------------------------------------------------------
# part_brand_double_jeopardy — penetration vs purchase frequency
# ---------------------------------------------------------------------------


def q_part_brand_double_jeopardy(sf_dir: str):
    """Double Jeopardy: per brand, penetration (distinct buying
    customers / all buying customers) and purchase frequency (lineitems
    per buying customer); the law predicts a POSITIVE correlation.
    Counts fold exactly; the per-brand ratios and Pearson r are
    mirrored float. One row: n_brands, r_micro, slope_micro (frequency
    on penetration).

    Scale shape: the `customer_brand_loyalty` tagged join exchange;
    the |brands| regression runs on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "brand": pd.Series(
                    t["l_partkey"].to_numpy(zero_copy_only=False)
                ).map(p2b_).to_numpy(object),
                "cust": np.int64(-1),
                "_b": (k % _DJ_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "brand": "",
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "_b": (k % _DJ_BUCKETS).astype(np.int64),
            }
        )

    def join_merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["cust"] < 0][["k", "brand"]]
        o = g[g["cust"] >= 0][["k", "cust"]]
        m = li.merge(o, on="k")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "brand": pd.Series([], dtype=object),
                    "cust": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            m.groupby(["brand", "cust"]).size().rename("c").reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    cb = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).map_batches(li_rows, batch_format="pyarrow")
        .union(
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey"],
            ).map_batches(o_rows, batch_format="pyarrow")
        )
        .groupby("_b")
        .map_groups(join_merge, batch_format="pandas")
        .to_pandas()
        .groupby(["brand", "cust"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_brands", "r_micro", "slope_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cb.empty:
        return empty
    total_cust = int(cb["cust"].nunique())
    per = cb.groupby("brand").agg(
        n_cust=("cust", "nunique"), n_items=("c", "sum")
    )
    k = len(per)
    if k < 3 or total_cust == 0:
        return empty
    x = per["n_cust"].to_numpy(np.int64).astype(np.float64) / float(
        total_cust
    )
    y = (
        per["n_items"].to_numpy(np.int64).astype(np.float64)
        / per["n_cust"].to_numpy(np.int64).astype(np.float64)
    )
    kf = float(k)
    sx, sy = float(x.sum()), float(y.sum())
    sxx = float((x * x).sum())
    syy = float((y * y).sum())
    sxy = float((x * y).sum())
    cx = kf * sxx - sx * sx
    cy = kf * syy - sy * sy
    if cx <= 0.0 or cy <= 0.0:
        return empty
    r = (kf * sxy - sx * sy) / float(np.sqrt(cx * cy))
    slope = (kf * sxy - sx * sy) / cx
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES335["part_brand_double_jeopardy"] = """
WITH cb AS (
  SELECT p.p_brand AS brand, o.o_custkey AS cust,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
tc AS (SELECT CAST(count(DISTINCT cust) AS BIGINT) AS t FROM cb),
per AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(c) AS BIGINT) AS n_items
  FROM cb GROUP BY 1
),
xy AS (
  SELECT CAST(n_cust AS DOUBLE) / tc.t AS x,
         CAST(n_items AS DOUBLE) / n_cust AS y
  FROM per, tc
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy
)
SELECT CAST(k AS BIGINT) AS n_brands,
       CAST(floor((k * sxy - sx * sy)
                  / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
       CAST(floor((k * sxy - sx * sy) / (k * sxx - sx * sx)
                  * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
FROM m
WHERE k >= 3 AND (k * sxx - sx * sx) > 0 AND (k * syy - sy * sy) > 0"""


QUERIES335 = {
    "events_type_quantile_rank_shift": q_events_type_quantile_rank_shift,
    "part_brand_double_jeopardy": q_part_brand_double_jeopardy,
}
