"""Driver-contract queries, wave 67 — k-NN hubness (the in-degree
distribution of the neighbor graph; hub vectors poison retrieval) and linear
interpolation of hourly gaps (the imputation step before any window model).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES67: dict[str, str] = {}

_HUB_NQ = 50
_HUB_K = 5
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# emb_knn_hubness — in-degree histogram of the cosine k-NN graph
# ---------------------------------------------------------------------------


def q_emb_knn_hubness(sf_dir: str):
    """Hubness diagnostic: exact cosine top-5 for the first 50 vectors, then
    the in-degree histogram over neighbors — how concentrated the neighbor
    graph is (a long tail of high in-degree = hub pollution).

    Scale shape: the ann_topk broadcast-matmul shape with a 50-query matrix;
    the 250-row result folds to the bounded (degree → count) histogram on
    the driver."""
    from .queries2 import _load_queries
    from ..stages.similarity import brute_force_topk

    q, qids = _load_queries(sf_dir, n=_HUB_NQ)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    top = brute_force_topk(ds, q, qids, k=_HUB_K)
    deg = top.groupby("neighbor_id").size()
    hist = deg.value_counts().sort_index()
    return pd.DataFrame(
        {
            "in_degree": hist.index.to_numpy(np.int64),
            "n_vectors": hist.to_numpy(np.int64),
        }
    )


ORACLES67["emb_knn_hubness"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {_HUB_NQ}
),
ranked AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             q.qv) DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_HUB_K}
),
deg AS (
  SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
  FROM ranked GROUP BY 1
)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY in_degree ORDER BY in_degree"""


# ---------------------------------------------------------------------------
# events_interpolate_gaps — linear fill of interior zero hours
# ---------------------------------------------------------------------------


def q_events_interpolate_gaps(sf_dir: str):
    """Imputation: every INTERIOR zero hour (a non-zero observation exists on
    both sides for that type) gets the linear interpolation of its bracketing
    observations, in exact integer micro units with round-half-up:
    filled = (2·10⁶·((R−h)·x_L + (h−L)·x_R) + (R−L)) // (2·(R−L)).
    Leading/trailing zeros (no bracket) stay unfilled — documented contract.

    Scale shape: the (type, hour) combiner exchange, then one vectorized
    ``searchsorted`` against the known positions per type on the bounded
    grid; output rows are only the filled gap hours."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hr": hrs}
        )
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| x calendar-hour domain
        .groupby(["event_type", "hr"])["cnt"]
        .sum()
    )
    h0 = int(hist.index.get_level_values("hr").min())
    h1 = int(hist.index.get_level_values("hr").max())
    span = h1 - h0 + 1
    out_et, out_hr, out_fill = [], [], []
    for et in sorted(hist.index.get_level_values("event_type").unique()):
        x = np.zeros(span, dtype=np.int64)
        sub = hist.loc[et]
        x[sub.index.to_numpy(np.int64) - h0] = sub.to_numpy(np.int64)
        known = np.where(x > 0)[0]
        gaps = np.where(x == 0)[0]
        if len(known) < 2 or len(gaps) == 0:
            continue
        pos = np.searchsorted(known, gaps)
        interior = (pos > 0) & (pos < len(known))
        gp = gaps[interior]
        L = known[pos[interior] - 1]
        R = known[pos[interior]]
        num = 2 * 1_000_000 * ((R - gp) * x[L] + (gp - L) * x[R]) + (R - L)
        fill = num // (2 * (R - L))
        out_et.extend([et] * len(gp))
        out_hr.extend((gp + h0).tolist())
        out_fill.extend(fill.tolist())
    return pd.DataFrame(
        {
            # dtype=object explicitly: an empty list would otherwise build a
            # float64 column and break the strict dtype gate when the corpus
            # has no interior gaps (the sf0.1 case)
            "event_type": pd.Series(out_et, dtype=object),
            "hr": np.array(out_hr, np.int64),
            "filled_micro": np.array(out_fill, np.int64),
        }
    )


ORACLES67["events_interpolate_gaps"] = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
types AS (SELECT DISTINCT event_type FROM h),
grid AS (
  SELECT t.event_type, g.h0 + CAST(r.range AS BIGINT) AS hr
  FROM g CROSS JOIN range(0, 200000) r CROSS JOIN types t
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.event_type, grid.hr, coalesce(h.cnt, 0) AS cnt
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.hr = grid.hr
),
w AS (
  SELECT event_type, hr, cnt,
         last_value(CASE WHEN cnt > 0 THEN hr END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lh,
         last_value(CASE WHEN cnt > 0 THEN cnt END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lx,
         first_value(CASE WHEN cnt > 0 THEN hr END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS rh,
         first_value(CASE WHEN cnt > 0 THEN cnt END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS rx
  FROM x
)
SELECT event_type, hr,
       CAST((2 * 1000000 * ((rh - hr) * lx + (hr - lh) * rx) + (rh - lh))
            // (2 * (rh - lh)) AS BIGINT) AS filled_micro
FROM w
WHERE cnt = 0 AND lh IS NOT NULL AND rh IS NOT NULL"""


QUERIES67 = {
    "emb_knn_hubness": q_emb_knn_hubness,
    "events_interpolate_gaps": q_events_interpolate_gaps,
}
