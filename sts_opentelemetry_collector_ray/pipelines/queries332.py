"""Driver-contract queries, wave 332 — the intra-order price-consistency
audit (does the same part trade at different unit prices WITHIN one
order?) and the type-correlation matrix summary (mean/extreme pairwise
daily-series correlations across all event types). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES332: dict[str, str] = {}

_DAY_US = 86_400_000_000
_IP_BUCKETS = 64


# ---------------------------------------------------------------------------
# lineitem_intra_order_price_variance — same part, same order, same price?
# ---------------------------------------------------------------------------


def q_lineitem_intra_order_price_variance(sf_dir: str):
    """Billing-consistency audit: per (order, part) group the distinct
    unit prices (cents); multi-line groups whose lines disagree on the
    unit price are billing anomalies. Pure integer counting. One row:
    n_groups, n_multi, n_varying, varying_share_micro (of multi-line
    groups).

    Scale shape: lineitems bucket NATURALLY by l_orderkey; each bucket
    emits three scalars — no cross-bucket state."""

    def partial(t: pa.Table) -> pd.DataFrame:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "ok": ok,
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "unit": np.floor(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    / t["l_quantity"].to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        df["_b"] = (df["ok"] % _IP_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["ok", "pk"])["unit"].agg(["size", "nunique"])
        return pd.DataFrame(
            {
                "n_groups": [np.int64(len(per))],
                "n_multi": [np.int64(int((per["size"] >= 2).sum()))],
                "n_varying": [np.int64(int(
                    ((per["size"] >= 2) & (per["nunique"] >= 2)).sum()
                ))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_groups", "n_multi", "n_varying", "varying_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n_groups = int(p["n_groups"])
    n_multi = int(p["n_multi"])
    n_var = int(p["n_varying"])
    if n_groups == 0:
        return empty
    share = (
        float(n_var) / float(n_multi) if n_multi > 0 else 0.0
    )
    return pd.DataFrame(
        [
            (
                np.int64(n_groups), np.int64(n_multi), np.int64(n_var),
                np.int64(np.floor(share * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES332["lineitem_intra_order_price_variance"] = """
WITH per AS (
  SELECT l_orderkey, l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT CAST(floor(
           l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT))
           AS BIGINT) AS nu
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi,
         CAST(sum(CASE WHEN n >= 2 AND nu >= 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_varying
  FROM per
)
SELECT n_groups, n_multi, n_varying,
       CAST(CASE WHEN n_multi > 0
                 THEN floor(CAST(n_varying AS DOUBLE)
                            / CAST(n_multi AS DOUBLE) * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS varying_share_micro
FROM agg
WHERE n_groups > 0"""


# ---------------------------------------------------------------------------
# events_type_corr_summary — the whole type-correlation matrix at once
# ---------------------------------------------------------------------------


def q_events_type_corr_summary(sf_dir: str):
    """Correlation-matrix summary: Pearson correlations between EVERY
    pair of event types' zero-filled daily series (exact integer
    moments per pair), summarized as the mean absolute, most positive
    and most negative correlations. One row: n_types, n_pairs,
    mean_abs_r_micro, max_r_micro, min_r_micro."""

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
    )
    cols = ["n_types", "n_pairs", "mean_abs_r_micro", "max_r_micro",
            "min_r_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    d0 = int(h.index.get_level_values(0).min())
    d1 = int(h.index.get_level_values(0).max())
    n = d1 - d0 + 1
    if n < 3:
        return empty
    types = sorted(set(h.index.get_level_values(1)))
    if len(types) < 2:
        return empty
    vecs = {}
    for t_ in types:
        v = np.zeros(n, np.int64)
        sub = h.xs(t_, level=1)
        v[sub.index.to_numpy(np.int64) - d0] = sub.to_numpy(np.int64)
        vecs[t_] = v.astype(object)
    rs = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            va, vb = vecs[a], vecs[b]
            sa, sb = int(va.sum()), int(vb.sum())
            saa = int((va * va).sum())
            sbb = int((vb * vb).sum())
            sab = int((va * vb).sum())
            ca = n * saa - sa * sa
            cb = n * sbb - sb * sb
            if ca <= 0 or cb <= 0:
                continue
            rs.append(
                float(n * sab - sa * sb)
                / (float(np.sqrt(float(ca))) * float(np.sqrt(float(cb))))
            )
    if not rs:
        return empty
    arr = np.array(rs, np.float64)
    return pd.DataFrame(
        [
            (
                np.int64(len(types)), np.int64(len(arr)),
                np.int64(np.floor(
                    float(np.abs(arr).mean()) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(float(arr.max()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(arr.min()) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES332["events_type_corr_summary"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, event_type AS et,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
types AS (SELECT DISTINCT et FROM h),
grid AS (
  SELECT t.et, g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM types t, g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
vec AS (
  SELECT grid.et, grid.dy, CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM grid LEFT JOIN h ON h.et = grid.et AND h.dy = grid.dy
),
mom AS (
  SELECT a.et AS ea, b.et AS eb,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.c) AS BIGINT) AS sa, CAST(sum(b.c) AS BIGINT) AS sb,
         CAST(sum(CAST(a.c AS HUGEINT) * a.c) AS HUGEINT) AS saa,
         CAST(sum(CAST(b.c AS HUGEINT) * b.c) AS HUGEINT) AS sbb,
         CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS sab
  FROM vec a JOIN vec b ON b.dy = a.dy AND a.et < b.et
  GROUP BY 1, 2
),
r AS (
  SELECT CAST(CAST(n AS HUGEINT) * sab - CAST(sa AS HUGEINT) * sb
              AS DOUBLE)
           / (sqrt(CAST(CAST(n AS HUGEINT) * saa
                        - CAST(sa AS HUGEINT) * sa AS DOUBLE))
              * sqrt(CAST(CAST(n AS HUGEINT) * sbb
                          - CAST(sb AS HUGEINT) * sb AS DOUBLE))) AS v
  FROM mom
  WHERE (CAST(n AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa) > 0
    AND (CAST(n AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb) > 0
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
nn AS (SELECT CAST(g.d1 - g.d0 + 1 AS BIGINT) AS n FROM g)
SELECT nt.k AS n_types, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(avg(abs(v)) * 1000000.0 + 0.5) AS BIGINT)
         AS mean_abs_r_micro,
       CAST(floor(max(v) * 1000000.0 + 0.5) AS BIGINT) AS max_r_micro,
       CAST(floor(min(v) * 1000000.0 + 0.5) AS BIGINT) AS min_r_micro
FROM r, nt, nn
WHERE nn.n >= 3 AND nt.k >= 2
GROUP BY nt.k
HAVING count(*) > 0"""


QUERIES332 = {
    "lineitem_intra_order_price_variance": q_lineitem_intra_order_price_variance,
    "events_type_corr_summary": q_events_type_corr_summary,
}
