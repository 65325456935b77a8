"""Driver-contract queries, wave 54 — product-quantization code assignment
(the memory-compression step ANN indexes build on) and last-touch marketing
attribution (the conversion-credit report behind channel budgeting). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES54: dict[str, str] = {}

_PQ_DIM = 64
_PQ_M = 4  # subspaces
_PQ_K = 16  # codewords per subspace
_ATTR_LOOKBACK_US = 7 * 86_400_000_000  # 7-day attribution window
_ATTR_TOUCHES = ("click", "view")
_ATTR_CONVERSION = "purchase"
_ATTR_BUCKETS = 64


# ---------------------------------------------------------------------------
# emb_pq — product-quantization codes (seeded per-subspace codebooks)
# ---------------------------------------------------------------------------


def _pq_codebooks() -> list[np.ndarray]:
    """One seeded unit codebook per 16-dim subspace (seed varies per
    subspace) — data-independent like ``seeded_centroids``, so the constants
    inline into a static SQL oracle. With unit codewords, min-L2 assignment
    ≡ max-dot (||v−c||² = ||v||² − 2v·c + 1), ties → lowest code."""
    from ..stages.similarity import _unit

    sub = _PQ_DIM // _PQ_M
    books = []
    for m in range(_PQ_M):
        rng = np.random.default_rng(1000 + m)
        books.append(_unit(rng.standard_normal((_PQ_K, sub))))
    return books


def q_emb_pq(sf_dir: str):
    """PQ encode the embedding corpus: split each 64-dim vector into 4
    contiguous 16-dim subvectors, assign each to its nearest (max-dot, unit
    codewords) codeword among 16 — 4 nibbles ≈ 2 bytes per vector, the
    32× compression behind IVF-PQ indexes.

    Scale shape: codebooks broadcast once (driver constants), one
    zero-copy FixedSizeList flatten + reshape + 4 matmuls per batch,
    stateless tasks, zero shuffles."""
    from ..functions.vectors import stack_list_column

    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M

    def encode(t: pa.Table) -> pa.Table:
        v = stack_list_column(t["embedding"])
        cols = {"vec_id": t["vec_id"]}
        codes = []
        for m, cb in enumerate(books):
            dots = v[:, m * sub : (m + 1) * sub] @ cb.T
            c = dots.argmax(axis=1).astype(np.int64)  # ties -> lowest code
            codes.append(c)
            cols[f"code_{m}"] = pa.array(c)
        packed = codes[0]
        for c in codes[1:]:
            packed = packed * _PQ_K + c
        cols["packed"] = pa.array(packed.astype(np.int64))
        return pa.table(cols).replace_schema_metadata(None)

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(encode, batch_format="pyarrow")


def _pq_oracle() -> str:
    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M
    with_parts, joins = [], []
    for m, cb in enumerate(books):
        values = ",\n    ".join(
            f"({ci}, [" + ", ".join(repr(float(x)) for x in cb[ci]) + "])"
            for ci in range(_PQ_K)
        )
        with_parts.append(
            f"cb{m}(cid, c) AS (SELECT * FROM (VALUES\n    {values}) t(cid, c))"
        )
        with_parts.append(
            f"""a{m} AS (
  SELECT vec_id, cid AS code_{m}
  FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v{m}, c) DESC, cid ASC)
             AS r
    FROM sl, cb{m}
  ) WHERE r = 1
)"""
        )
        joins.append(f"JOIN a{m} USING (vec_id)")
    slices = ", ".join(
        f"CAST(embedding[{m * sub + 1}:{(m + 1) * sub}] AS DOUBLE[]) AS v{m}"
        for m in range(_PQ_M)
    )
    code_cols = ",\n       ".join(
        f"CAST(code_{m} AS BIGINT) AS code_{m}" for m in range(_PQ_M)
    )
    packed = "code_0"
    for m in range(1, _PQ_M):
        packed = f"({packed} * {_PQ_K} + code_{m})"
    return f"""
WITH sl AS (SELECT vec_id, {slices} FROM embeddings),
{", ".join(with_parts)}
SELECT sl.vec_id,
       {code_cols},
       CAST({packed} AS BIGINT) AS packed
FROM sl {" ".join(joins)}"""


ORACLES54["emb_pq"] = _pq_oracle()


# ---------------------------------------------------------------------------
# events_attribution — last-touch conversion credit with 7-day lookback
# ---------------------------------------------------------------------------


def q_events_attribution(sf_dir: str):
    """Last-touch attribution: each purchase credits the latest preceding
    click/view of the same user (order = (ts, event_id); 7-day lookback),
    else the 'direct' channel. Output: per-channel conversion count and
    summed purchase value in integer cents.

    Scale shape: ONE user-bucket exchange; per-bucket vectorized scan —
    sort by (user, ts, event_id), forward-fill the last touch position with
    ``np.maximum.accumulate`` + per-user segment-start invalidation, then a
    bounded per-(bucket, channel) partial; |buckets|x3 rows reach the
    driver."""
    import ray  # noqa: F401  (parity with sibling queries; bucket fn is pure)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _b=(df["user_id"].to_numpy(np.int64) % _ATTR_BUCKETS).astype(np.int64)
        )

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(np.int64),
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                g["user_id"].to_numpy(np.int64),
            )
        )
        uid = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        val = g["value"].to_numpy(np.float64)[order]
        n = len(uid)
        pos = np.arange(n, dtype=np.int64)
        touch = np.isin(et, list(_ATTR_TOUCHES))
        tpos = np.where(touch, pos, -1)
        run = np.maximum.accumulate(tpos)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(np.where(new_user, pos, 0))
        conv = et == _ATTR_CONVERSION
        valid = conv & (run >= seg_start)
        idx = np.where(valid, run, 0)
        in_window = valid & (ts[idx] >= ts - _ATTR_LOOKBACK_US)
        channel = np.where(conv & in_window, et[idx], "direct")
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        out = pd.DataFrame(
            {"channel": channel[conv], "cents": cents[conv]}
        )
        part = (
            out.groupby("channel", sort=False)
            .agg(n_conversions=("cents", "size"), value_cents=("cents", "sum"))
            .reset_index()
        )
        part["n_conversions"] = part["n_conversions"].astype(np.int64)
        part["value_cents"] = part["value_cents"].astype(np.int64)
        return part

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(attribute, batch_format="pandas")
        .to_pandas()  # bounded: |buckets| x |channels|
    )
    out = (
        parts.groupby("channel")
        .agg(n_conversions=("n_conversions", "sum"), value_cents=("value_cents", "sum"))
        .reset_index()
        .sort_values("channel", kind="mergesort")
        .reset_index(drop=True)
    )
    out["n_conversions"] = out["n_conversions"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    return out


ORACLES54["events_attribution"] = f"""
WITH seq AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS lt_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS lt_us,
         epoch_us(ts) AS ts_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
conv AS (
  SELECT CASE WHEN lt_us IS NOT NULL
                   AND lt_us >= ts_us - {_ATTR_LOOKBACK_US}
              THEN lt_type ELSE 'direct' END AS channel,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM seq WHERE event_type = '{_ATTR_CONVERSION}'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM conv GROUP BY channel ORDER BY channel"""


QUERIES54 = {
    "emb_pq": q_emb_pq,
    "events_attribution": q_events_attribution,
}
