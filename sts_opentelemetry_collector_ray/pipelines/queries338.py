"""Driver-contract queries, wave 338 — the discrete-time reorder hazard
curve (P(reorder in week w | no reorder yet) from inter-order gaps) and
the duplicate part-name audit (same name, different SKU). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES338: dict[str, str] = {}

_RH_BUCKETS = 64
_RH_WEEKS = 8


# ---------------------------------------------------------------------------
# customer_reorder_hazard — discrete hazard of the next order
# ---------------------------------------------------------------------------


def q_customer_reorder_hazard(sf_dir: str):
    """Reorder hazard: every consecutive same-customer order gap (days,
    by order date) enters the risk set; for week w = 1..8,
    hazard(w) = gaps landing in ((w-1)*7, w*7] / gaps >= (w-1)*7 + 1
    (discrete-time hazard; pure integer counting from the exact gap
    histogram). Per week: week, n_at_risk, n_events, hazard_micro.

    Scale shape: per-customer ordered gaps ride ONE custkey-bucket
    exchange; each bucket emits its bounded gap histogram."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "k": df["o_custkey"].to_numpy(np.int64),
                "dy": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // 86_400_000_000,
            }
        )
        out["_b"] = (out["k"] % _RH_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"g": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["k", "dy"], kind="stable")
        k = g["k"].to_numpy(np.int64)
        dy = g["dy"].to_numpy(np.int64)
        same = k[1:] == k[:-1]
        gaps = (dy[1:] - dy[:-1])[same]
        gaps = gaps[gaps >= 1]  # same-day repeat orders are not gaps
        if len(gaps) == 0:
            return zero
        h = pd.Series(gaps).groupby(gaps).size()
        return pd.DataFrame(
            {"g": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("g")["c"]
        .sum()
        .sort_index()
    )
    cols = ["week", "n_at_risk", "n_events", "hazard_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    g = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    total = int(c.sum())
    rows = []
    for w in range(1, _RH_WEEKS + 1):
        lo, hi = (w - 1) * 7, w * 7
        at_risk = int(c[g > lo].sum())
        events = int(c[(g > lo) & (g <= hi)].sum())
        if at_risk == 0:
            continue
        rows.append(
            (
                np.int64(w), np.int64(at_risk), np.int64(events),
                np.int64(np.floor(
                    float(events) / float(at_risk) * 1_000_000.0 + 0.5
                )),
            )
        )
    _ = total
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c_: np.int64 for c_ in cols}
    )


ORACLES338["customer_reorder_hazard"] = """
WITH gaps AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000
              - lag(epoch_us(o_orderdate) // 86400000000) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                ) AS BIGINT) AS g
  FROM orders
),
gg AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g >= 1),
wk AS (SELECT CAST(r.range AS BIGINT) + 1 AS w FROM range(0, 8) r),
agg AS (
  SELECT wk.w,
         CAST(sum(CASE WHEN gg.g > (wk.w - 1) * 7 THEN 1 ELSE 0 END)
              AS BIGINT) AS at_risk,
         CAST(sum(CASE WHEN gg.g > (wk.w - 1) * 7 AND gg.g <= wk.w * 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS ev
  FROM wk CROSS JOIN gg
  GROUP BY 1
)
SELECT w AS week, at_risk AS n_at_risk, ev AS n_events,
       CAST(floor(CAST(ev AS DOUBLE) / at_risk * 1000000.0 + 0.5)
            AS BIGINT) AS hazard_micro
FROM agg
WHERE at_risk > 0
ORDER BY week"""


# ---------------------------------------------------------------------------
# part_duplicate_names — same name, different SKU
# ---------------------------------------------------------------------------


def q_part_duplicate_names(sf_dir: str):
    """Catalog-quality audit: part names shared by multiple partkeys.
    Pure integer counting. One row: n_names, n_dup_names,
    n_parts_in_dups, max_multiplicity, dup_name_share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        g = pd.Series(
            t["p_name"].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pd.DataFrame(
            {"name": g.index.to_numpy(object), "c": g.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("name")["c"]
        .sum()
    )
    cols = [
        "n_names", "n_dup_names", "n_parts_in_dups", "max_multiplicity",
        "dup_name_share_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n_names = int(len(h))
    dup = h[h >= 2]
    n_dup = int(len(dup))
    n_parts = int(dup.sum())
    mx = int(h.max())
    return pd.DataFrame(
        [
            (
                np.int64(n_names), np.int64(n_dup), np.int64(n_parts),
                np.int64(mx),
                np.int64(np.floor(
                    float(n_dup) / float(n_names) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES338["part_duplicate_names"] = """
WITH h AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS c FROM part GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_names,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_names,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS n_parts_in_dups,
         CAST(max(c) AS BIGINT) AS max_multiplicity
  FROM h
)
SELECT n_names, n_dup_names, n_parts_in_dups, max_multiplicity,
       CAST(floor(CAST(n_dup_names AS DOUBLE) / n_names * 1000000.0 + 0.5)
            AS BIGINT) AS dup_name_share_micro
FROM agg
WHERE n_names > 0"""


QUERIES338 = {
    "customer_reorder_hazard": q_customer_reorder_hazard,
    "part_duplicate_names": q_part_duplicate_names,
}
