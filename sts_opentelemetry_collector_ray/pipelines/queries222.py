"""Driver-contract queries, wave 222 — pairwise Granger-causality F-tests
over aligned daily count series (lag-1 restricted vs unrestricted OLS) and
a triplet-margin audit over embeddings (nearest same-label vs nearest
other-label distances per anchor).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES222: dict[str, str] = {}

_TM_ANCHORS = 100


# ---------------------------------------------------------------------------
# events_granger_f — lag-1 Granger causality per ordered type pair
# ---------------------------------------------------------------------------


def q_events_granger_f(sf_dir: str):
    """Top-3 ordered type pairs X→Y by the lag-1 Granger (1969) F:
    unrestricted y_t ~ y_{t−1} + x_{t−1} (centered 2×2 OLS) vs restricted
    y_t ~ y_{t−1}; F = (SSR_r − SSR_u)/(SSR_u/(n−3)) over days common to
    both series. Output: x_type, y_type, n_obs, f_micro.

    Scale shape: bounded daily fold; the |types|² pair regressions run
    vectorized on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["x_type", "y_type", "n_obs", "f_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(np.int64 if c in ("n_obs", "f_micro")
                                 else object)) for c in cols}
    )
    if daily.empty:
        return empty
    series = {
        et: sub.set_index("day")["n"]
        for et, sub in daily.groupby("event_type", sort=True)
    }
    types = sorted(series)
    rows = []
    for xt in types:
        for yt in types:
            if xt == yt:
                continue
            common = series[xt].index.intersection(series[yt].index).sort_values()
            if len(common) < 6:
                continue
            nx = series[xt].loc[common].to_numpy(np.float64)
            ny = series[yt].loc[common].to_numpy(np.float64)
            y = ny[1:]
            x1 = ny[:-1]
            x2 = nx[:-1]
            n = float(len(y))
            s1, s2, sy = x1.sum(), x2.sum(), y.sum()
            s11 = (x1 * x1).sum()
            s22 = (x2 * x2).sum()
            s12 = (x1 * x2).sum()
            s1y = (x1 * y).sum()
            s2y = (x2 * y).sum()
            syy = (y * y).sum()
            s11c = s11 - s1 * s1 / n
            s22c = s22 - s2 * s2 / n
            s12c = s12 - s1 * s2 / n
            s1yc = s1y - s1 * sy / n
            s2yc = s2y - s2 * sy / n
            syyc = syy - sy * sy / n
            det = s11c * s22c - s12c * s12c
            if det == 0.0 or s11c <= 0.0:
                continue
            b1 = (s1yc * s22c - s2yc * s12c) / det
            b2 = (s2yc * s11c - s1yc * s12c) / det
            ssr_u = syyc - b1 * s1yc - b2 * s2yc
            br = s1yc / s11c
            ssr_r = syyc - br * s1yc
            if ssr_u <= 0.0 or n <= 3.0:
                continue
            f = (ssr_r - ssr_u) / (ssr_u / (n - 3.0))
            rows.append(
                (xt, yt, np.int64(n),
                 np.int64(np.floor(f * 1_000_000.0 + 0.5)))
            )
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=cols)
    df = df.sort_values(
        ["f_micro", "x_type", "y_type"], ascending=[False, True, True],
        kind="mergesort",
    ).head(3)
    return df.reset_index(drop=True).astype(
        {"n_obs": np.int64, "f_micro": np.int64}
    )


ORACLES222["events_granger_f"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT x.event_type AS xt, y.event_type AS yt, x.day,
         x.n AS nx, y.n AS ny
  FROM daily x JOIN daily y ON x.day = y.day AND x.event_type <> y.event_type
),
lagged AS (
  SELECT xt, yt, ny AS y,
         lag(ny) OVER w AS x1, lag(nx) OVER w AS x2
  FROM pairs WINDOW w AS (PARTITION BY xt, yt ORDER BY day)
),
pts AS (SELECT xt, yt, y, x1, x2 FROM lagged WHERE x1 IS NOT NULL),
m AS (
  SELECT xt, yt, CAST(count(*) AS DOUBLE) AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM pts GROUP BY 1, 2 HAVING count(*) >= 5
),
c AS (
  SELECT xt, yt, n,
         s11 - s1 * s1 / n AS s11c, s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c, s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc, syy - sy * sy / n AS syyc
  FROM m
),
b AS (
  SELECT xt, yt, n, s1yc, s2yc, syyc, s11c,
         (s1yc * s22c - s2yc * s12c) / (s11c * s22c - s12c * s12c) AS b1,
         (s2yc * s11c - s1yc * s12c) / (s11c * s22c - s12c * s12c) AS b2
  FROM c WHERE s11c * s22c - s12c * s12c <> 0.0 AND s11c > 0.0
),
f AS (
  SELECT xt, yt, n,
         ((syyc - (s1yc / s11c) * s1yc) - (syyc - b1 * s1yc - b2 * s2yc))
           / ((syyc - b1 * s1yc - b2 * s2yc) / (n - 3.0)) AS f,
         syyc - b1 * s1yc - b2 * s2yc AS ssr_u
  FROM b
)
SELECT xt AS x_type, yt AS y_type, CAST(n AS BIGINT) AS n_obs,
       CAST(floor(f * 1000000.0 + 0.5) AS BIGINT) AS f_micro
FROM f WHERE ssr_u > 0.0 AND n > 3.0
ORDER BY f_micro DESC, x_type ASC, y_type ASC LIMIT 3"""


# ---------------------------------------------------------------------------
# emb_triplet_margin — nearest same-label vs other-label distances
# ---------------------------------------------------------------------------


def q_emb_triplet_margin(sf_dir: str):
    """Metric-learning audit over the first 100 anchors: per anchor the
    squared-Euclidean distance to the nearest SAME-label and nearest
    OTHER-label vector (ties → vec_id); margin = d_neg − d_pos. Per label:
    n_anchors, n_violations (margin < 0) and mean margin (micro).

    Scale shape: anchors broadcast; per-batch candidate mins fold per
    anchor (bounded anchor set), the per-label summary on the driver."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), np.int64)
    lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
    emb = t["embedding"]
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // len(ids)
    mat = flat.reshape(len(ids), d)
    order = np.argsort(ids)
    ids, lab, mat = ids[order], lab[order], mat[order]
    na = min(_TM_ANCHORS, len(ids))
    cols = ["label", "n_anchors", "n_violations", "mean_margin_micro"]
    rows = []
    margins: dict[int, list] = {}
    for qi in range(na):
        diff = mat - mat[qi]
        dist = (diff * diff).sum(axis=1)
        same = (lab == lab[qi]) & (ids != ids[qi])
        other = lab != lab[qi]
        if not same.any() or not other.any():
            continue
        # nearest with vec_id tie-break
        def nearest(mask):
            cand = np.flatnonzero(mask)
            o = np.lexsort((ids[cand], dist[cand]))
            return dist[cand[o[0]]]

        dp = nearest(same)
        dn = nearest(other)
        margins.setdefault(int(lab[qi]), []).append(dn - dp)
    for lb in sorted(margins):
        ms = np.array(margins[lb], np.float64)
        rows.append(
            (
                np.int64(lb), np.int64(len(ms)),
                np.int64(int((ms < 0.0).sum())),
                np.int64(np.floor(ms.sum() / len(ms) * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


ORACLES222["emb_triplet_margin"] = f"""
WITH a AS (
  SELECT vec_id AS aid, embedding AS ae, label AS al
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_TM_ANCHORS})
),
dist AS MATERIALIZED (
  SELECT a.aid, a.al, e.vec_id, e.label,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(a.ae[i] AS DOUBLE))
                * (CAST(e.embedding[i] AS DOUBLE)
                   - CAST(a.ae[i] AS DOUBLE)))) AS d2
  FROM a JOIN embeddings e ON e.vec_id <> a.aid
),
np_ AS (
  SELECT aid, al,
         min(CASE WHEN label = al THEN d2 END) AS dp,
         min(CASE WHEN label <> al THEN d2 END) AS dn
  FROM dist GROUP BY 1, 2
),
mg AS (
  SELECT al AS label, dn - dp AS margin
  FROM np_ WHERE dp IS NOT NULL AND dn IS NOT NULL
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(sum(CASE WHEN margin < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(floor(sum(margin) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS mean_margin_micro
FROM mg GROUP BY 1 ORDER BY 1"""


QUERIES222 = {
    "events_granger_f": q_events_granger_f,
    "emb_triplet_margin": q_emb_triplet_margin,
}
