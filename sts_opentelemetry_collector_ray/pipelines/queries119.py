"""Driver-contract queries, wave 119 — user lifecycle census (the
new/active/at-risk/churned snapshot every growth dashboard leads with,
anchored at the corpus max day) and IVF list balance (per-centroid
assignment counts for the seeded coarse quantizer — the imbalance factor
that predicts ANN tail latency). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES119: dict[str, str] = {}

_LC_BUCKETS = 32
_DAY_US = 86_400_000_000
_IVF_K = 16
_IVF_DIM = 64


# ---------------------------------------------------------------------------
# events_lifecycle_census — new / active / at-risk / churned snapshot
# ---------------------------------------------------------------------------


def q_events_lifecycle_census(sf_dir: str):
    """Lifecycle stages at the corpus max day: per user, age = days since
    FIRST event, recency = days since LAST event; stage = 'new' (age ≤ 7),
    else 'active' (recency ≤ 7), else 'at_risk' (recency ≤ 28), else
    'churned'. Census = stage counts + share bp.

    Scale shape: per-batch per-user (min ts, max ts) partials → ONE
    user-bucket exchange for the exact re-reduce → bounded 4-row stage
    partials per bucket; the driver folds."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        g = (
            pd.DataFrame({"u": u, "lo": d, "hi": d})
            .groupby("u", sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
            .reset_index()
        )
        g["_b"] = (g["u"] % _LC_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: g.groupby("u", sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
            .reset_index()
            .astype(np.int64),
            batch_format="pandas",
        )
        .to_pandas()  # one row per user
        .groupby("u")
        .agg(lo=("lo", "min"), hi=("hi", "max"))
    )
    mx = int(part["hi"].max())
    age = mx - part["lo"].to_numpy(np.int64)
    rec = mx - part["hi"].to_numpy(np.int64)
    stage = np.where(
        age <= 7, "new", np.where(rec <= 7, "active", np.where(rec <= 28, "at_risk", "churned"))
    )
    total = len(part)
    rows = []
    for s in ("active", "at_risk", "churned", "new"):
        n = int((stage == s).sum())
        rows.append(
            {"stage": s, "n_users": n, "share_bp": n * 10_000 // max(total, 1)}
        )
    return pd.DataFrame(rows, columns=["stage", "n_users", "share_bp"]).astype(
        {"n_users": np.int64, "share_bp": np.int64}
    )


ORACLES119["events_lifecycle_census"] = f"""
WITH u AS (
  SELECT user_id, min(epoch_us(ts) // {_DAY_US}) AS lo,
         max(epoch_us(ts) // {_DAY_US}) AS hi
  FROM events GROUP BY 1
),
b AS (SELECT max(hi) AS mx FROM u),
s AS (
  SELECT CASE WHEN mx - lo <= 7 THEN 'new'
              WHEN mx - hi <= 7 THEN 'active'
              WHEN mx - hi <= 28 THEN 'at_risk'
              ELSE 'churned' END AS stage
  FROM u, b
),
t AS (SELECT count(*) AS n FROM s),
c AS (SELECT stage, count(*) AS n_users FROM s GROUP BY stage),
names(stage) AS (VALUES ('active'), ('at_risk'), ('churned'), ('new'))
SELECT names.stage, CAST(coalesce(c.n_users, 0) AS BIGINT) AS n_users,
       CAST(coalesce(c.n_users, 0) * 10000
            // greatest((SELECT n FROM t), 1) AS BIGINT) AS share_bp
FROM names LEFT JOIN c USING (stage)"""


# ---------------------------------------------------------------------------
# emb_ivf_balance — list-size balance of the seeded coarse quantizer
# ---------------------------------------------------------------------------


def q_emb_ivf_balance(sf_dir: str):
    """IVF health: assign every vector to its max-dot seeded centroid (the
    ann_ivf quantizer; ties → lowest id) and report each list's size plus
    the global imbalance factor max·K·10⁶ // n (1e6 = perfectly balanced)
    — skewed lists are the ANN tail-latency smoking gun.

    Scale shape: centroids are broadcast constants; one flatten + matmul +
    bincount per batch; |K| partial rows per block fold on the driver."""
    from ..functions.vectors import stack_list_column
    from ..stages.similarity import seeded_centroids

    cents = seeded_centroids(_IVF_DIM, _IVF_K, seed=42)

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        a = (v @ cents.T).argmax(axis=1)
        cnt = np.bincount(a, minlength=_IVF_K)
        return pd.DataFrame(
            {"cid": np.arange(_IVF_K, dtype=np.int64), "n": cnt.astype(np.int64)}
        )

    part = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("cid")["n"]
        .sum()
        .reindex(range(_IVF_K), fill_value=0)
    )
    n = int(part.sum())
    mx = int(part.max())
    return pd.DataFrame(
        {
            "cid": np.arange(_IVF_K, dtype=np.int64),
            "list_size": part.to_numpy(np.int64),
            "imbalance_micro": np.full(
                _IVF_K, mx * _IVF_K * 1_000_000 // max(n, 1), np.int64
            ),
        }
    )


def _ivf_balance_oracle() -> str:
    from ..stages.similarity import seeded_centroids

    cents = seeded_centroids(_IVF_DIM, _IVF_K, seed=42)
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(_IVF_K)
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}) t(cid, c)),
a AS (
  SELECT vec_id, cid
  FROM (
    SELECT e.vec_id, cents.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_dot_product(
                                CAST(e.embedding AS DOUBLE[]), cents.c)
                                DESC, cents.cid ASC) AS r
    FROM embeddings e, cents
  ) WHERE r = 1
),
h AS (
  SELECT cents.cid, CAST(count(a.vec_id) AS BIGINT) AS list_size
  FROM cents LEFT JOIN a USING (cid) GROUP BY 1
),
s AS (SELECT CAST(sum(list_size) AS BIGINT) AS n,
             CAST(max(list_size) AS BIGINT) AS mx FROM h)
SELECT CAST(h.cid AS BIGINT) AS cid, h.list_size,
       CAST(s.mx * {_IVF_K} * 1000000 // greatest(s.n, 1) AS BIGINT)
         AS imbalance_micro
FROM h, s"""


ORACLES119["emb_ivf_balance"] = _ivf_balance_oracle()


QUERIES119 = {
    "events_lifecycle_census": q_events_lifecycle_census,
    "emb_ivf_balance": q_emb_ivf_balance,
}
