"""Driver-contract queries, wave 118 — seasonality strength (one-way eta²
of value by hour-of-day per event type: how much of the variance the clock
explains — the is-it-worth-a-seasonal-model score) and TwoNN intrinsic
dimension (the Facco et al. two-nearest-neighbor estimator over the
embedding corpus — the manifold-dimension readout representation analyses
report). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES118: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_TN_PROBES = 50


# ---------------------------------------------------------------------------
# events_seasonality_strength — hour-of-day eta² per type
# ---------------------------------------------------------------------------


def q_events_seasonality_strength(sf_dir: str):
    """Variance explained by hour-of-day: per type,
    eta²_micro = (T − S²)·10⁶ // (n·Σx² − S²) with
    T = Σₕ (n·Sₕ²) // nₕ — the per-hour quotients FLOOR by contract so the
    whole statistic is PURE integer and replays exactly (the floor bias is
    < 24/SST, far below the 1e-6 release grain at any real n).

    Scale shape: per-batch (type, hour, n, Σx, Σx²) combiner partials —
    |types|×24 rows per block — fold on the driver with Python ints; no
    shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        hod = ((t["ts"].cast(pa.int64()).to_numpy() // _HOUR_US) % 24).astype(
            np.int64
        )
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"ty": et, "h": hod, "n": 1, "s": cents, "s2": cents * cents}
            )
            .groupby(["ty", "h"], sort=False)
            .sum()
            .reset_index()
        )
        return g.astype({"n": np.int64, "s": np.int64, "s2": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["ty", "h"])[["n", "s", "s2"]]
        .sum()
    )
    rows = []
    for ty in sorted(part.index.get_level_values(0).unique()):
        g = part.xs(ty)
        n = int(g["n"].sum())
        s = int(g["s"].sum())
        s2 = int(g["s2"].sum())
        t_sum = sum(
            (n * int(r["s"]) * int(r["s"])) // int(r["n"]) for _, r in g.iterrows()
        )
        sst = n * s2 - s * s
        rows.append(
            {
                "event_type": ty,
                "n": n,
                "eta2_micro": (t_sum - s * s) * 1_000_000 // sst if sst > 0 else 0,
            }
        )
    out = pd.DataFrame(rows, columns=["event_type", "n", "eta2_micro"])
    return out.astype({"n": np.int64, "eta2_micro": np.int64})


ORACLES118["events_seasonality_strength"] = f"""
WITH e AS (
  SELECT event_type AS ty, (epoch_us(ts) // {_HOUR_US}) % 24 AS h,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS x
  FROM events
),
ph AS (
  SELECT ty, h, CAST(count(*) AS HUGEINT) AS nh,
         CAST(sum(x) AS HUGEINT) AS sh
  FROM e GROUP BY 1, 2
),
pt AS (
  SELECT ty, CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(x * x) AS HUGEINT) AS s2
  FROM e GROUP BY 1
),
t AS (
  SELECT ph.ty, CAST(sum((pt.n * ph.sh * ph.sh) // ph.nh) AS HUGEINT) AS tsum
  FROM ph JOIN pt USING (ty) GROUP BY 1
)
SELECT pt.ty AS event_type,
       CAST(pt.n AS BIGINT) AS n,
       CAST(CASE WHEN pt.n * pt.s2 - pt.s * pt.s > 0
                 THEN (t.tsum - pt.s * pt.s) * 1000000
                      // (pt.n * pt.s2 - pt.s * pt.s)
                 ELSE 0 END AS BIGINT) AS eta2_micro
FROM pt JOIN t ON t.ty = pt.ty"""


# ---------------------------------------------------------------------------
# emb_intrinsic_dim — TwoNN manifold-dimension estimate
# ---------------------------------------------------------------------------


def q_emb_intrinsic_dim(sf_dir: str):
    """TwoNN: for each of the first {P} probes, μᵢ = d₂/d₁ over the two
    nearest non-self neighbors (squared Euclid on unit vectors ⇒
    monotone in 1 − cos), and d̂ = (P) / Σ ln μᵢ with
    ln μᵢ = 0.5·(ln(1−cos₂) − ln(1−cos₁)); the ln terms accumulate in
    probe-id order on both sides (the users_entropy fixed-order technique).
    Released floor-half-up at 1e-6.

    Scale shape: the ann_topk shape — probes broadcast, per-batch local
    top-3 partials, bounded driver merge; one scalar out.""".format(
        P=_TN_PROBES
    )
    import ray
    import pyarrow.parquet as pq_mod

    from ..functions.vectors import stack_list_column, topk_partials
    from ..stages.similarity import _unit

    head = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, _TN_PROBES)
    q = _unit(stack_list_column(head["embedding"]))
    qids = head["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qref = ray.put((q, qids))

    def local_topk(t: pa.Table) -> pd.DataFrame:
        qm, qids_ = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _unit(stack_list_column(t["embedding"])) @ qm.T
        qid, nid, score = topk_partials(sims, ids, qids_, 3)
        return pd.DataFrame({"query_id": qid, "neighbor_id": nid, "score": score})

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    ln_sum = 0.0
    n_used = 0
    for qid in qids:  # fixed probe order → fixed float accumulation
        g = partials[partials["query_id"] == qid]
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(2)
        if len(g) < 2:
            continue
        c1, c2 = float(g["score"].iloc[0]), float(g["score"].iloc[1])
        ln_sum = ln_sum + 0.5 * (np.log(1.0 - c2) - np.log(1.0 - c1))
        n_used += 1
    dim = n_used / ln_sum if ln_sum > 0 else 0.0
    return pd.DataFrame(
        {
            "n_probes": np.array([n_used], np.int64),
            "id_micro": np.array(
                [int(np.floor(dim * 1_000_000.0 + 0.5))], np.int64
            ),
        }
    )


ORACLES118["emb_intrinsic_dim"] = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {_TN_PROBES}
),
scored AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS score
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
),
r AS (
  SELECT qid, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, nid) AS rn
  FROM scored
),
p AS (
  SELECT qid,
         max(CASE WHEN rn = 1 THEN score END) AS c1,
         max(CASE WHEN rn = 2 THEN score END) AS c2
  FROM r WHERE rn <= 2 GROUP BY qid HAVING count(*) = 2
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         list_sum(list(0.5 * (ln(1.0 - c2) - ln(1.0 - c1)) ORDER BY qid))
           AS ln_sum
  FROM p
)
SELECT n_used AS n_probes,
       CAST(CASE WHEN ln_sum > 0
                 THEN floor(CAST(n_used AS DOUBLE) / ln_sum * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS id_micro
FROM s"""


QUERIES118 = {
    "events_seasonality_strength": q_events_seasonality_strength,
    "emb_intrinsic_dim": q_emb_intrinsic_dim,
}
