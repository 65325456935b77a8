"""Driver-contract queries, wave 16 — distributed k-means centroid update
(the M-step companion to `emb_kmeans`'s E-step, exact in quantized integers)
and per-conversation feature extraction (the curriculum/quality feature table
over the transcript family). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ORACLES16: dict[str, str] = {}

_KM_DIM, _KM_K = 64, 8
_CF_BUCKETS = 64

_TOOL_MAP16 = {
    "error": "bash",
    "purchase": "search",
    "signup": "",
    "click": "",
    "view": "browser",
}


# ---------------------------------------------------------------------------
# emb_kmeans_update — one exact distributed M-step (per-cluster coord sums)
# ---------------------------------------------------------------------------


def q_emb_kmeans_update(sf_dir: str):
    """One k-means M-step at corpus scale: assign each vector to its nearest
    seeded centroid (the oracled `emb_kmeans` E-step) and reduce per-cluster
    coordinate sums + member counts. Coordinates quantize to micro-units
    (floor(x*1e6 + 0.5), exact int64) so the distributed sum is
    order-independent and bit-identical to the SQL replay — the float-sum
    nondeterminism that normally makes distributed centroid updates
    unhashable is gone by construction. Per-batch partials are ≤ k×dim rows,
    so the exchange is constant-size regardless of corpus size; new centroids
    are sum_micro / n_members / 1e6, computable anywhere downstream."""
    from ray.data.aggregate import Sum

    from ..stages.similarity import _unit, seeded_centroids, stack_list_column

    cents = _unit(seeded_centroids(_KM_DIM, _KM_K, seed=42))
    ref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = stack_list_column(t["embedding"]).astype(np.float64)
        a = (mat @ c.T).argmax(axis=1).astype(np.int64)
        q = np.floor(mat * 1000000.0 + 0.5).astype(np.int64)
        order = np.argsort(a, kind="stable")
        a_s, q_s = a[order], q[order]
        bounds = np.concatenate(
            [[0], np.nonzero(a_s[1:] != a_s[:-1])[0] + 1]
        )
        cids = a_s[bounds]
        sums = np.add.reduceat(q_s, bounds, axis=0)  # (#present, dim)
        counts = np.diff(np.concatenate([bounds, [len(a_s)]]))
        k_present = len(cids)
        return pa.table(
            {
                "cluster": pa.array(np.repeat(cids, _KM_DIM)),
                "dim": pa.array(
                    np.tile(np.arange(_KM_DIM, dtype=np.int64), k_present)
                ),
                "s": pa.array(sums.reshape(-1)),
                "c": pa.array(np.repeat(counts.astype(np.int64), _KM_DIM)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["cluster", "dim"]).aggregate(
        Sum("s", alias_name="sum_micro"), Sum("c", alias_name="n_members")
    )


def _emb_kmeans_update_oracle(dim: int = _KM_DIM, k: int = _KM_K) -> str:
    """Replays the M-step: inlined unit seed-42 centroids (the `emb_kmeans`
    oracle's assignment), then per-(cluster, dim) sums of the same
    floor-quantized micro-units."""
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(dim, k, seed=42))
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(k)
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}
  ) t(cid, c)
),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid ASC) AS r
  FROM corpus, cents
),
a AS (SELECT cid, v FROM assign WHERE r = 1),
exploded AS (
  SELECT cid, i - 1 AS dim,
         CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT) AS q
  FROM a, UNNEST(range(1, len(v)::BIGINT + 1)) t(i)
)
SELECT CAST(cid AS BIGINT) AS cluster, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(q) AS BIGINT) AS sum_micro, count(*) AS n_members
FROM exploded GROUP BY 1, 2"""


ORACLES16["emb_kmeans_update"] = _emb_kmeans_update_oracle()


# ---------------------------------------------------------------------------
# conv_features — per-conversation curriculum/quality feature table
# ---------------------------------------------------------------------------


def q_conv_features(sf_dir: str):
    """Per-conversation feature extraction (turn count, tool-call density,
    error count, wall-clock span) — the feature table a curriculum or
    quality-filter stage consumes. ONE bounded conv-bucket exchange + a
    single vectorized pandas multi-aggregate per bucket (never one Python
    group per conversation); conv_id matches the transcript derivation
    byte-for-byte ('conv-' || %08d)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"]
        return pd.DataFrame(
            {
                "conv_id": "conv-" + df["user_id"].astype(str).str.zfill(8),
                "ts": df["ts"].to_numpy(),
                "tool_flag": (et.map(_TOOL_MAP16) != "").to_numpy(),
                "is_err": (et == "error").to_numpy(),
                "_b": (
                    df["user_id"].to_numpy().astype(np.uint64) % _CF_BUCKETS
                ).astype(np.int32),
            }
        )

    def feats(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("conv_id", sort=False)
            .agg(
                n_turns=("conv_id", "size"),
                n_tool_turns=("tool_flag", "sum"),
                n_errors=("is_err", "sum"),
                mn=("ts", "min"),
                mx=("ts", "max"),
            )
            .reset_index()
        )
        span = (
            out["mx"].to_numpy("datetime64[us]")
            - out["mn"].to_numpy("datetime64[us]")
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": out["conv_id"],
                "n_turns": out["n_turns"].astype(np.int64),
                "n_tool_turns": out["n_tool_turns"].astype(np.int64),
                "n_errors": out["n_errors"].astype(np.int64),
                "span_us": span,
            }
        )

    b = ds.map_batches(prep, batch_format="pandas")
    return b.groupby("_b").map_groups(feats, batch_format="pandas")


ORACLES16["conv_features"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """
SELECT conv_id,
       count(*) AS n_turns,
       CAST(count(*) FILTER (WHERE tool <> '') AS BIGINT) AS n_tool_turns,
       CAST(count(*) FILTER (WHERE text LIKE '[ERROR]%') AS BIGINT) AS n_errors,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS span_us
FROM transcripts
GROUP BY conv_id"""
)


QUERIES16 = {
    "emb_kmeans_update": q_emb_kmeans_update,
    "conv_features": q_conv_features,
}
