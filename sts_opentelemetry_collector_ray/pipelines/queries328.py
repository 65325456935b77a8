"""Driver-contract queries, wave 328 — the metricity audit of cosine
distance on the bounded embedding sample (triangle-inequality violation
rate — what breaks metric-tree ANN indexes) and the temporal centroid of
the event stream (median day vs center-of-mass day). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES328: dict[str, str] = {}

_MA_MAX_ID = 128
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# emb_metricity_audit — triangle-inequality violations of 1 - cos
# ---------------------------------------------------------------------------


def q_emb_metricity_audit(sf_dir: str):
    """Metricity audit on the vec_id < 128 sample: with
    d(a,b) = 1 - cos(a,b) (single-division cosine, bit-mirroring
    list_dot_product), count ordered triples (a < b, c distinct) where
    d(a,b) > d(a,c) + d(c,b) — cosine distance is NOT a metric and the
    violation rate tells you whether metric-pruning ANN structures are
    safe on this embedding space. One row: n_triples, n_violations,
    rate_micro, max_excess_micro."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], _MA_MAX_ID))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    cols = ["n_triples", "n_violations", "rate_micro", "max_excess_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(t)
    if n < 3:
        return empty
    v = np.stack([np.asarray(e) for e in t["embedding"]]).astype(np.float64)
    d_dim = v.shape[1]
    norms2 = np.zeros(n)
    dots = np.zeros((n, n))
    for j in range(d_dim):
        norms2 = norms2 + v[:, j] * v[:, j]
        dots = dots + v[:, j][:, None] * v[None, :, j]
    dist = 1.0 - dots / (
        np.sqrt(norms2)[:, None] * np.sqrt(norms2)[None, :]
    )
    n_triples = 0
    n_viol = 0
    max_excess = 0.0
    for a in range(n):
        for b in range(a + 1, n):
            # vectorize over c
            c_mask = np.ones(n, bool)
            c_mask[a] = False
            c_mask[b] = False
            lhs = dist[a, b]
            rhs = dist[a, c_mask] + dist[c_mask, b]
            viol = lhs > rhs
            n_triples += int(c_mask.sum())
            nv = int(viol.sum())
            n_viol += nv
            if nv:
                ex = float((lhs - rhs[viol]).max())
                if ex > max_excess:
                    max_excess = ex
    return pd.DataFrame(
        [
            (
                np.int64(n_triples), np.int64(n_viol),
                np.int64(np.floor(
                    float(n_viol) / float(n_triples) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(max_excess * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES328["emb_metricity_audit"] = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {_MA_MAX_ID}
),
d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         1.0 - list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS dist
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
tri AS (
  SELECT ab.dist AS dab, ac.dist AS dac, cb.dist AS dcb
  FROM d ab
  JOIN d ac ON ac.ia = ab.ia
  JOIN d cb ON cb.ia = ac.ib AND cb.ib = ab.ib
  WHERE ab.ia < ab.ib AND ac.ib <> ab.ib
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN dab > dac + dcb THEN 1 ELSE 0 END) AS BIGINT)
           AS nv,
         coalesce(max(CASE WHEN dab > dac + dcb
                           THEN dab - (dac + dcb) END), 0.0) AS mx
  FROM tri
)
SELECT n AS n_triples, nv AS n_violations,
       CAST(floor(CAST(nv AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT)
         AS rate_micro,
       CAST(floor(mx * 1000000.0 + 0.5) AS BIGINT) AS max_excess_micro
FROM agg
WHERE n > 0"""


# ---------------------------------------------------------------------------
# events_temporal_centroid — median day vs center-of-mass day
# ---------------------------------------------------------------------------


def q_events_temporal_centroid(sf_dir: str):
    """Temporal balance of the stream: the median event day (smallest
    day with 2 cum >= total — exact integers) vs the center-of-mass day
    (sum day*count / total, one division); their gap measures temporal
    skew of the corpus. One row: n_events, median_day, centroid_milli,
    skew_days_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        dy = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(dy).groupby(dy).size()
        return pd.DataFrame(
            {"dy": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dy")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n_events", "median_day", "centroid_milli", "skew_days_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    dy = h.index.to_numpy(np.int64).astype(object)
    c = h.to_numpy(np.int64).astype(object)
    n = int(c.sum())
    if n == 0:
        return empty
    cum = np.cumsum(c)
    i = next(i for i, cv in enumerate(cum) if 2 * int(cv) >= n)
    med = int(dy[i])
    sw = int((dy * c).sum())
    centroid = float(sw) / float(n)
    skew = centroid - float(med)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(med),
                np.int64(np.floor(centroid * 1_000.0 + 0.5)),
                np.int64(np.floor(skew * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES328["events_temporal_centroid"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(dy * c) AS BIGINT) AS sw
  FROM h
),
med AS (
  SELECT min(dy) AS m FROM (
    SELECT dy, sum(c) OVER (ORDER BY dy) AS cum FROM h
  ), tot WHERE 2 * cum >= tot.n
)
SELECT tot.n AS n_events, CAST(med.m AS BIGINT) AS median_day,
       CAST(floor(CAST(tot.sw AS DOUBLE) / tot.n * 1000.0 + 0.5) AS BIGINT)
         AS centroid_milli,
       CAST(floor((CAST(tot.sw AS DOUBLE) / tot.n - CAST(med.m AS DOUBLE))
                  * 1000.0 + 0.5) AS BIGINT) AS skew_days_milli
FROM tot, med
WHERE tot.n > 0"""


QUERIES328 = {
    "emb_metricity_audit": q_emb_metricity_audit,
    "events_temporal_centroid": q_events_temporal_centroid,
}
