"""Driver-contract queries, wave 31 — length-decile assignment (the
length-bucketed curriculum/batching transform, exact rank-based) and full-row
distinct (the classic duplicate-row cleaning pass). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES31: dict[str, str] = {}

_LD_BUCKETS = 64
_DR_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_len_deciles — rank-based length decile per document
# ---------------------------------------------------------------------------


def q_docs_len_deciles(sf_dir: str):
    """Length-decile assignment (the T5/fairseq length-bucketing transform):
    decile = floor(10·(rank−1)/n) with rank() ties-share-rank semantics —
    deterministic under any partitioning, unlike NTILE. Exact two-pass shape:
    the value-domain histogram of n_chars ships as (value, count) through one
    bounded bucket exchange (the `events_winsorize` trick), the driver folds
    it into a distinct-value→rank map (bounded by the char-length domain),
    and a stateless broadcast-lookup pass labels every doc — the corpus never
    sorts."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "_b": pa.array((u.astype(np.uint64) % _LD_BUCKETS).astype(np.int32)),
                "v": pa.array(u.astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    hist = (
        ray.data.read_parquet(path, columns=["n_chars"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pandas")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    # rank(v) = 1 + count of rows strictly smaller (ties share the rank)
    below = np.concatenate([[0], hist["cnt"].cumsum().to_numpy()[:-1]])
    dec = (10 * below) // n  # floor(10·(rank−1)/n)
    vals = pa.array(hist["v"].to_numpy())
    decs = dec.astype(np.int64)

    def label(t: pa.Table) -> pa.Table:
        i = pc.index_in(
            pc.cast(t["n_chars"], pa.int64()), value_set=vals
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "decile": pa.array(decs[i]),
            }
        )

    return ray.data.read_parquet(path, columns=["doc_id", "n_chars"]).map_batches(
        label, batch_format="pyarrow"
    )


ORACLES31["docs_len_deciles"] = """
SELECT doc_id, n_chars,
       CAST(10 * (rank() OVER (ORDER BY n_chars) - 1) // count(*) OVER ()
            AS BIGINT) AS decile
FROM documents"""


# ---------------------------------------------------------------------------
# events_distinct_rows — full-row duplicate removal
# ---------------------------------------------------------------------------


def q_events_distinct_rows(sf_dir: str):
    """Full-row DISTINCT (the classic duplicate-record cleaning pass): each
    batch pre-dedups, rows bucket-exchange by a full-row hash (all copies of
    a row share a bucket), and one vectorized drop_duplicates per bucket
    finishes — DISTINCT * without a global sort, exchange bounded by the
    per-batch-distinct stream."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    cols = ["event_id", "user_id", "event_type", "value"]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def prep(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        canon = pc.binary_join_element_wise(
            *[
                pc.cast(pa.array(df[c].to_numpy()), pa.string())
                if c != "event_type"
                else pa.array(df[c].to_numpy(dtype=object), pa.string())
                for c in cols
            ],
            "|",
        )
        h = fnv1a64_arrow(canon)
        df["_b"] = (h % _DR_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_b"]).drop_duplicates()

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(dedup, batch_format="pandas")
    )


ORACLES31["events_distinct_rows"] = """
SELECT DISTINCT event_id, user_id, event_type, value FROM events"""


QUERIES31 = {
    "docs_len_deciles": q_docs_len_deciles,
    "events_distinct_rows": q_events_distinct_rows,
}
