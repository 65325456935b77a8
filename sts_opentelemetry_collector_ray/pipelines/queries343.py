"""Driver-contract queries, wave 343 — retention by acquisition type
(does the FIRST event's type predict coming back?) and the duplicate
embedding audit (identical vectors under different ids). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES343: dict[str, str] = {}

_RF_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_retention_by_first_type — acquisition-type retention rates
# ---------------------------------------------------------------------------


def q_users_retention_by_first_type(sf_dir: str):
    """Acquisition analysis: each user's FIRST event (min (ts,
    event_id)) determines the acquisition type; retention = the user
    has at least 2 events. Pure integer counting. Per type: first_type,
    n_users, n_retained, rate_micro.

    Scale shape: ONE user-bucket exchange; per-bucket idxmin +
    count fold emits a |types|-bounded census."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % _RF_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "et": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "r": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        first = g.drop_duplicates("u", keep="first")
        sizes = g.groupby("u").size()
        first = first.assign(
            ret=(sizes.reindex(first["u"]).to_numpy() >= 2).astype(np.int64)
        )
        agg = first.groupby("et").agg(n=("ret", "size"), r=("ret", "sum"))
        return agg.reset_index().astype({"n": np.int64, "r": np.int64})

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("et")[["n", "r"]]
        .sum()
        .sort_index()
    )
    cols = ["first_type", "n_users", "n_retained", "rate_micro"]
    empty = pd.DataFrame(
        {
            "first_type": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"et": "first_type", "n": "n_users", "r": "n_retained"}
    )
    out["rate_micro"] = np.floor(
        out["n_retained"].to_numpy(np.float64)
        / out["n_users"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols[1:]})[cols]


ORACLES343["users_retention_by_first_type"] = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n_ev
  FROM events
),
first AS (
  SELECT event_type AS first_type,
         CAST(n_ev >= 2 AS BIGINT) AS ret
  FROM ranked WHERE rk = 1
),
agg AS (
  SELECT first_type, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(ret) AS BIGINT) AS n_retained
  FROM first GROUP BY 1
)
SELECT first_type, n_users, n_retained,
       CAST(floor(CAST(n_retained AS DOUBLE) / CAST(n_users AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM agg
ORDER BY first_type"""


# ---------------------------------------------------------------------------
# emb_duplicate_vectors — identical embeddings under different ids
# ---------------------------------------------------------------------------


def q_emb_duplicate_vectors(sf_dir: str):
    """Embedding-store audit: vectors that are bitwise identical across
    different vec_ids (a symptom of upstream hashing collisions or
    re-ingestion). Pure exact equality on the float payload. One row:
    n_vecs, n_distinct, n_dup_groups, n_dup_vecs, max_multiplicity."""

    def partial(t: pa.Table) -> pd.DataFrame:
        from ..functions.vectors import stack_list_column

        v = stack_list_column(t["embedding"])
        keys = [v[i].tobytes() for i in range(v.shape[0])]
        g = pd.Series(keys).value_counts()
        return pd.DataFrame(
            {"k": g.index.to_numpy(object), "c": g.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["c"]
        .sum()
    )
    cols = ["n_vecs", "n_distinct", "n_dup_groups", "n_dup_vecs",
            "max_multiplicity"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n = int(h.sum())
    nd = int(len(h))
    dup = h[h >= 2]
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(nd), np.int64(len(dup)),
                np.int64(int(dup.sum())), np.int64(int(h.max())),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES343["emb_duplicate_vectors"] = """
WITH h AS (
  SELECT embedding, CAST(count(*) AS BIGINT) AS c
  FROM embeddings GROUP BY 1
),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_groups,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS n_dup_vecs,
         CAST(max(c) AS BIGINT) AS mx
  FROM h
)
SELECT n AS n_vecs, nd AS n_distinct, n_dup_groups, n_dup_vecs,
       mx AS max_multiplicity
FROM agg
WHERE n > 0"""


QUERIES343 = {
    "users_retention_by_first_type": q_users_retention_by_first_type,
    "emb_duplicate_vectors": q_emb_duplicate_vectors,
}
