"""Driver-contract queries, wave 80 — embedding OOD screen (top-20 vectors
farthest from their nearest label centroid: the outlier-mining step behind
data-cleaning / active-learning loops; ALL-INTEGER geometry, not a single
float) and seasonal hour-of-day anomaly detection (per event type, the hours
deviating most from their hour-of-day seasonal mean on the dense grid —
division-free micro deviations). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES80: dict[str, str] = {}

_OOD_SCALE = 1 << 20
_OOD_OFF = 1 << 40
_OOD_DIM = 64
_OOD_TOPK = 20
_SEA_TOPK = 20
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# emb_ood — vectors farthest from their nearest label centroid
# ---------------------------------------------------------------------------


def q_emb_ood(sf_dir: str):
    """OOD/outlier mining: with the wave-63 fixed-point label centroids, each
    vector's nearest-centroid squared distance is an EXACT int64; the top-20
    by (distance DESC, vec_id ASC) are the cleaning/review candidates.
    Nearest-label ties break to the smallest label.

    Scale shape: pass 1 is the |labels|×d centroid exchange; the int matrix
    broadcasts in the closure; pass 2 emits per-batch LOCAL top-20 partials
    (blocks×20 rows) and the driver takes the global 20 — raw vectors never
    leave their blocks."""
    from ..functions.vectors import stack_list_column

    def cen_partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _OOD_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for l in np.unique(lab):
            sel = q[lab == l]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(_OOD_DIM, l, np.int64),
                        "dim": np.arange(_OOD_DIM, dtype=np.int64),
                        "s": sel.sum(axis=0),
                        "n": np.full(_OOD_DIM, len(sel), np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    cen = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        .map_batches(cen_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |labels| × d per block
        .groupby(["label", "dim"])
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
        .sort_values(["label", "dim"], kind="mergesort")
    )
    labels = np.sort(cen["label"].unique()).astype(np.int64)
    L = len(labels)
    C = (
        (cen["s"].to_numpy(np.int64) // cen["n"].to_numpy(np.int64))
        .reshape(L, _OOD_DIM)
    )

    def ood_partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _OOD_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = t["vec_id"].to_numpy().astype(np.int64)
        diff = q[:, None, :] - C[None, :, :]
        d2 = np.einsum("nld,nld->nl", diff, diff)  # exact int64
        near_pos = d2.argmin(axis=1)  # first minimum -> smallest label wins
        near_d2 = d2[np.arange(len(q)), near_pos]
        near_lab = labels[near_pos]
        o = np.lexsort((vid, -near_d2))[: _OOD_TOPK]
        return pd.DataFrame(
            {
                "vec_id": vid[o],
                "label": lab[o],
                "nearest_label": near_lab[o],
                "nearest_d2": near_d2[o],
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
        .map_batches(ood_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ 20 rows per block
        .sort_values(["nearest_d2", "vec_id"], ascending=[False, True],
                     kind="mergesort")
        .head(_OOD_TOPK)
        .reset_index(drop=True)
    )
    for c in ("vec_id", "label", "nearest_label", "nearest_d2"):
        part[c] = part[c].astype(np.int64)
    return part


ORACLES80["emb_ood"] = f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS own, CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_OOD_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_OOD_DIM}) g(i)
),
a AS (
  SELECT own AS label, dim, sum(CAST(q AS HUGEINT)) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM u GROUP BY 1, 2
),
cent AS (
  SELECT label, dim,
         CAST(((s + n * {_OOD_OFF}) // n) - {_OOD_OFF} AS BIGINT) AS cfp
  FROM a
),
d2 AS (
  SELECT u.vec_id, u.own, c.label AS cand,
         sum(CAST((u.q - c.cfp) AS HUGEINT) * CAST((u.q - c.cfp) AS HUGEINT))
           AS d2
  FROM u JOIN cent c ON c.dim = u.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, own AS label, cand AS nearest_label,
         CAST(d2 AS BIGINT) AS nearest_d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cand ASC)
           AS rn
  FROM d2
)
SELECT vec_id, label, nearest_label, nearest_d2
FROM best WHERE rn = 1
ORDER BY nearest_d2 DESC, vec_id ASC LIMIT {_OOD_TOPK}"""


# ---------------------------------------------------------------------------
# events_seasonal_anomaly — hours farthest from their hour-of-day baseline
# ---------------------------------------------------------------------------


def q_events_seasonal_anomaly(sf_dir: str):
    """Seasonal anomaly screen: per (event_type, absolute hour) on the DENSE
    global grid (zero-count hours included), the deviation of the hour's
    count from its hour-of-day seasonal mean — dev_micro =
    |cnt·1e6 − (Σ·1e6)//n| over exact integers — top-20 by
    (dev DESC, type ASC, hour ASC).

    Scale shape: a tiny pre-pass reduces to three scalars (global min/max
    hour, the type list); per-batch (type, hour) combiner partials then
    bucket by hour-of-day (24 buckets) so each bucket owns its seasonal
    groups completely — dense zeros materialize per bucket, each bucket
    emits its LOCAL top-20, and the driver merges ≤ 24·20 rows."""

    def bounds_partial(t: pa.Table) -> pd.DataFrame:
        h = t["ts"].cast(pa.int64()).to_numpy() // _HOUR_US
        return pd.DataFrame(
            {
                "lo": [int(h.min())],
                "hi": [int(h.max())],
                "types": [",".join(sorted(set(
                    t["event_type"].to_numpy(zero_copy_only=False)
                )))],
            }
        )

    b = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(bounds_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per block
    )
    lo, hi = int(b["lo"].min()), int(b["hi"].max())
    types = sorted(set(",".join(b["types"]).split(",")))

    def cnt_partial(t: pa.Table) -> pd.DataFrame:
        h = t["ts"].cast(pa.int64()).to_numpy() // _HOUR_US
        g = (
            pd.DataFrame(
                {
                    "typ": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "h": h,
                }
            )
            .groupby(["typ", "h"], sort=False)
            .size()
            .reset_index(name="c")
        )
        g["c"] = g["c"].astype(np.int64)
        g["_b"] = (g["h"] % 24).astype(np.int64)
        return g

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        hod = int(g["_b"].iloc[0])
        first = lo + ((hod - lo) % 24)
        grid = np.arange(first, hi + 1, 24, dtype=np.int64)
        frames = []
        for typ in types:
            sel = g[g["typ"] == typ]
            cnt = (
                sel.groupby("h")["c"].sum().reindex(grid, fill_value=0)
                .to_numpy(np.int64)
            )
            s, n = int(cnt.sum()), len(grid)
            mean_micro = (s * 1_000_000) // n
            dev = np.abs(cnt * 1_000_000 - mean_micro)
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": typ,
                        "hour": grid,
                        "cnt": cnt,
                        "seasonal_mean_micro": np.int64(mean_micro),
                        "dev_micro": dev.astype(np.int64),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(
            ["dev_micro", "event_type", "hour"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(_SEA_TOPK)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()  # bounded: ≤ 24·20 rows
        .sort_values(
            ["dev_micro", "event_type", "hour"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(_SEA_TOPK)
        .reset_index(drop=True)
    )
    for c in ("hour", "cnt", "seasonal_mean_micro", "dev_micro"):
        part[c] = part[c].astype(np.int64)
    part["event_type"] = part["event_type"].astype(object)
    return part[["event_type", "hour", "cnt", "seasonal_mean_micro", "dev_micro"]]


ORACLES80["events_seasonal_anomaly"] = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (
    SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS h
    FROM (SELECT min(h) AS lo, max(h) AS hi FROM e)
  ) g
),
cnts AS (
  SELECT g.event_type, g.h,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS cnt
  FROM grid g
  LEFT JOIN (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2) c
    ON c.event_type = g.event_type AND c.h = g.h
),
sea AS (
  SELECT event_type, h % 24 AS hod,
         (sum(CAST(cnt AS HUGEINT)) * 1000000)
           // CAST(count(*) AS HUGEINT) AS mean_micro
  FROM cnts GROUP BY 1, 2
),
dev AS (
  SELECT c.event_type, c.h AS hour, c.cnt,
         CAST(s.mean_micro AS BIGINT) AS seasonal_mean_micro,
         CAST(abs(CAST(c.cnt AS HUGEINT) * 1000000 - s.mean_micro) AS BIGINT)
           AS dev_micro
  FROM cnts c JOIN sea s
    ON s.event_type = c.event_type AND s.hod = c.h % 24
)
SELECT event_type, hour, cnt, seasonal_mean_micro, dev_micro
FROM dev
ORDER BY dev_micro DESC, event_type ASC, hour ASC
LIMIT {_SEA_TOPK}"""


QUERIES80 = {
    "emb_ood": q_emb_ood,
    "events_seasonal_anomaly": q_events_seasonal_anomaly,
}
