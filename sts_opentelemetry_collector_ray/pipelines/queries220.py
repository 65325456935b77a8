"""Driver-contract queries, wave 220 — exact 1-NN Shapley data valuation
(Jia et al. 2019 closed-form backward recursion, replayed in a recursive
CTE) and the Goh-Barabási burstiness + memory coefficients of per-user
inter-event gaps. Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES220: dict[str, str] = {}

_KS_QUERIES = 5  # first 5 vectors are the test points


# ---------------------------------------------------------------------------
# emb_knn_shapley — exact 1-NN Shapley values per test point
# ---------------------------------------------------------------------------


def q_emb_knn_shapley(sf_dir: str):
    """Exact 1-NN Shapley data valuation (Jia et al. 2019): test points =
    the first 5 vectors, training = the rest; rank training points by
    squared Euclidean distance ASC (ties → vec_id), I_j = 1{label_j =
    label_test}; s_(n) = I_(n)/n and s_(j) = s_(j+1) + (I_(j) − I_(j+1))/j.
    Output per test point: its top-3 most valuable training points
    (shapley DESC, vec_id ASC). Columns: query_id, train_id, rank,
    shapley_micro.

    Scale shape: per-batch distance partials against the broadcast query
    matrix (zero-copy FixedSizeList); the per-query sorted recursion is
    O(n) on the driver (bounded query set)."""
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
    q_ids = ids[:_KS_QUERIES]
    cols = ["query_id", "train_id", "rank", "shapley_micro"]
    if len(ids) <= _KS_QUERIES + 1:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    tr_ids, tr_lab, tr_mat = (
        ids[_KS_QUERIES:], lab[_KS_QUERIES:], mat[_KS_QUERIES:]
    )
    rows = []
    for qi in range(_KS_QUERIES):
        diff = tr_mat - mat[qi]
        dist = (diff * diff).sum(axis=1)
        o = np.lexsort((tr_ids, dist))  # dist ASC, id ASC
        ii = (tr_lab[o] == lab[qi]).astype(np.float64)
        n = len(ii)
        s = np.empty(n, np.float64)
        s[n - 1] = ii[n - 1] / n
        for j in range(n - 2, -1, -1):
            s[j] = s[j + 1] + (ii[j] - ii[j + 1]) / (j + 1.0)
        sub = pd.DataFrame(
            {
                "train_id": tr_ids[o],
                "shapley_micro": np.floor(s * 1_000_000.0 + 0.5).astype(
                    np.int64
                ),
            }
        )
        sub = sub.sort_values(
            ["shapley_micro", "train_id"], ascending=[False, True],
            kind="mergesort",
        ).head(3)
        for r, (_, row) in enumerate(sub.iterrows(), start=1):
            rows.append(
                (np.int64(q_ids[qi]), np.int64(row["train_id"]),
                 np.int64(r), np.int64(row["shapley_micro"]))
            )
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


ORACLES220["emb_knn_shapley"] = f"""
WITH RECURSIVE q AS (
  SELECT vec_id AS qid, embedding AS qe, label AS ql
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_KS_QUERIES})
),
tr AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id NOT IN (SELECT qid FROM q)
),
dist AS MATERIALIZED (
  SELECT q.qid, q.ql, tr.vec_id, tr.label,
         list_sum(list_transform(range(1, len(tr.embedding) + 1),
           i -> (CAST(tr.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
                * (CAST(tr.embedding[i] AS DOUBLE)
                   - CAST(q.qe[i] AS DOUBLE)))) AS d2
  FROM q, tr
),
rk AS MATERIALIZED (
  SELECT qid, vec_id,
         CASE WHEN label = ql THEN 1.0 ELSE 0.0 END AS ii,
         row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, vec_id ASC)
           AS j,
         count(*) OVER (PARTITION BY qid) AS n
  FROM dist
),
sh AS (
  SELECT qid, j, n, ii, ii / n AS s
  FROM rk WHERE j = n
  UNION ALL
  SELECT rk.qid, rk.j, rk.n, rk.ii,
         sh.s + (rk.ii - sh.ii) / rk.j
  FROM sh JOIN rk ON rk.qid = sh.qid AND rk.j = sh.j - 1
),
ranked AS (
  SELECT sh.qid, rk.vec_id, sh.s,
         row_number() OVER (PARTITION BY sh.qid
           ORDER BY floor(sh.s * 1000000.0 + 0.5) DESC, rk.vec_id ASC) AS r
  FROM sh JOIN rk ON rk.qid = sh.qid AND rk.j = sh.j
)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS train_id,
       CAST(r AS BIGINT) AS rank,
       CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS shapley_micro
FROM ranked WHERE r <= 3 ORDER BY query_id, rank"""


# ---------------------------------------------------------------------------
# events_burstiness_goh — burstiness and memory of inter-event gaps
# ---------------------------------------------------------------------------


def q_events_burstiness_goh(sf_dir: str):
    """Per event type over pooled per-user inter-event gaps: the
    Goh-Barabási (2008) burstiness B = (σ−μ)/(σ+μ) and the memory
    coefficient M = corr(gap_t, gap_{t+1}) over consecutive same-user
    same-type gap pairs. Output: event_type, n_gaps, n_pairs, b_micro,
    m_micro.

    Scale shape: gaps and consecutive pairs derive inside ONE user-bucket
    exchange (vectorized sorted diff); moment partials fold on the
    driver."""
    path = f"{sf_dir}/events.parquet"

    def bucketed(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id", "ts"]).to_pandas()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "event_type", "ts"], kind="mergesort")
        us = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(object)
        ts = d["ts"].astype("datetime64[us]").to_numpy("datetime64[us]").astype(np.int64)
        same = np.zeros(len(d), dtype=bool)
        same[1:] = (us[1:] == us[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(len(d), np.float64)
        gap[1:] = (ts[1:] - ts[:-1]) / 1_000_000.0
        gk = gap[same]
        ek = et[same]
        # consecutive gap pairs: both rows i-1, i are gaps of same (user,type)
        pair = same.copy()
        pair[1:] &= same[:-1]
        g1 = gap[np.flatnonzero(pair) - 1]
        g2 = gap[pair]
        ep = et[pair]
        a = pd.DataFrame({"event_type": ek, "n": 1, "s": gk, "s2": gk * gk})
        am = a.groupby("event_type", as_index=False).sum()
        am["kind"] = "g"
        am["sxy"] = 0.0
        am["sx"] = 0.0
        am["sy"] = 0.0
        am["sx2"] = 0.0
        am["sy2"] = 0.0
        b = pd.DataFrame(
            {"event_type": ep, "n": 1, "s": 0.0, "s2": 0.0,
             "sxy": g1 * g2, "sx": g1, "sy": g2, "sx2": g1 * g1,
             "sy2": g2 * g2}
        )
        bm = b.groupby("event_type", as_index=False).sum()
        bm["kind"] = "p"
        return pd.concat([am, bm], ignore_index=True).astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "user_id", "ts"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["event_type", "n_gaps", "n_pairs", "b_micro", "m_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    gstat = part[part["kind"] == "g"].groupby("event_type")[["n", "s", "s2"]].sum()
    pstat = part[part["kind"] == "p"].groupby("event_type")[
        ["n", "sxy", "sx", "sy", "sx2", "sy2"]
    ].sum()
    rows = []
    for et in sorted(gstat.index):
        ng = int(gstat.loc[et, "n"])
        if ng < 2:
            continue
        mu = gstat.loc[et, "s"] / ng
        var = gstat.loc[et, "s2"] / ng - mu * mu
        if var <= 0.0 or mu + np.sqrt(var) == 0.0:
            continue
        sd = np.sqrt(var)
        bb = (sd - mu) / (sd + mu)
        npair = int(pstat.loc[et, "n"]) if et in pstat.index else 0
        if npair >= 2:
            ps = pstat.loc[et]
            mx = ps["sx"] / npair
            my = ps["sy"] / npair
            cov = ps["sxy"] / npair - mx * my
            vx = ps["sx2"] / npair - mx * mx
            vy = ps["sy2"] / npair - my * my
            mm = cov / np.sqrt(vx * vy) if vx > 0.0 and vy > 0.0 else 0.0
        else:
            mm = 0.0
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append((et, np.int64(ng), np.int64(npair), micro(bb), micro(mm)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES220["events_burstiness_goh"] = """
WITH s AS (
  SELECT event_type, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT event_type, user_id, ts,
         date_diff('microsecond', prev, ts) / 1000000.0 AS gap
  FROM s WHERE prev IS NOT NULL
),
gstat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         sum(gap) / count(*) AS mu,
         sum(gap * gap) / count(*)
           - (sum(gap) / count(*)) * (sum(gap) / count(*)) AS var
  FROM gaps GROUP BY 1 HAVING count(*) >= 2
),
pairs AS (
  SELECT event_type,
         lag(gap) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS g1,
         gap AS g2
  FROM gaps
),
p2 AS (SELECT event_type, g1, g2 FROM pairs WHERE g1 IS NOT NULL),
pstat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS np,
         sum(g1) / count(*) AS mx, sum(g2) / count(*) AS my,
         sum(g1 * g2) / count(*)
           - (sum(g1) / count(*)) * (sum(g2) / count(*)) AS cov,
         sum(g1 * g1) / count(*)
           - (sum(g1) / count(*)) * (sum(g1) / count(*)) AS vx,
         sum(g2 * g2) / count(*)
           - (sum(g2) / count(*)) * (sum(g2) / count(*)) AS vy
  FROM p2 GROUP BY 1
)
SELECT g.event_type, g.ng AS n_gaps,
       CAST(coalesce(p.np, 0) AS BIGINT) AS n_pairs,
       CAST(floor((sqrt(g.var) - g.mu) / (sqrt(g.var) + g.mu)
                  * 1000000.0 + 0.5) AS BIGINT) AS b_micro,
       CAST(floor((CASE WHEN p.np >= 2 AND p.vx > 0.0 AND p.vy > 0.0
                        THEN p.cov / sqrt(p.vx * p.vy) ELSE 0.0 END)
                  * 1000000.0 + 0.5) AS BIGINT) AS m_micro
FROM gstat g LEFT JOIN pstat p ON g.event_type = p.event_type
WHERE g.var > 0.0 AND sqrt(g.var) + g.mu <> 0.0
ORDER BY g.event_type"""


QUERIES220 = {
    "emb_knn_shapley": q_emb_knn_shapley,
    "events_burstiness_goh": q_events_burstiness_goh,
}
