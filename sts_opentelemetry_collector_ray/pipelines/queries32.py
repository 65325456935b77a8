"""Driver-contract queries, wave 32 — int8 scalar quantization of embeddings
(the vector-store compression pass) and blocklist document filtering (the C4
badwords pass). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES32: dict[str, str] = {}

_QDIM = 64  # embeddings dim (asserted at runtime; the oracle hard-codes nothing)


# ---------------------------------------------------------------------------
# emb_quantize_int8 — per-dimension symmetric int8 quantization
# ---------------------------------------------------------------------------


def q_emb_quantize_int8(sf_dir: str):
    """Int8 scalar quantization (the vector-database compression recipe:
    symmetric per-dimension scale = max|x|/127, q = round-half-away(x/scale)).
    Two-pass shape: pass 1 ships one (dim, max|x|) partial row per dimension
    per block — a dim×blocks exchange regardless of corpus size — the driver
    folds ≤dim rows into the 64-double scale vector, and pass 2 is a stateless
    broadcast-scale quantize over a zero-copy flatten+reshape of the list
    column. Rounding is floor(x+0.5) half-away on BOTH sides (np.round's
    half-even differs from SQL); q_csv carries the full quantized vector as
    exact integers, q_l1 the order-independent integer L1 norm."""
    import pyarrow.compute as pc

    from ..functions.vectors import stack_list_column

    path = f"{sf_dir}/embeddings.parquet"

    def maxabs_partial(t: pa.Table) -> pa.Table:
        mat = stack_list_column(t["embedding"])
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mx": pa.array(np.abs(mat).max(axis=0)),
            }
        )

    partials = (
        ray.data.read_parquet(path, columns=["embedding"])
        .map_batches(maxabs_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: dim × blocks rows
    )
    mx = partials.groupby("dim")["mx"].max().sort_index().to_numpy()
    scales = mx / 127.0  # float64, same op order as the SQL
    safe = np.where(scales == 0.0, 1.0, scales)
    zero_dim = scales == 0.0

    def quantize(t: pa.Table) -> pa.Table:
        mat = stack_list_column(t["embedding"])
        n, d = mat.shape
        qf = mat / safe  # broadcast per-dim divide, IEEE double ≡ SQL
        q = np.where(mat >= 0, np.floor(qf + 0.5), -np.floor(-qf + 0.5))
        q = q.astype(np.int64)
        q[:, zero_dim] = 0
        flat = pc.cast(pa.array(q.ravel()), pa.string())
        offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
        q_csv = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), ",")
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "q_csv": q_csv,
                "q_l1": pa.array(np.abs(q).sum(axis=1)),
            }
        )

    return ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        quantize, batch_format="pyarrow"
    )


ORACLES32["emb_quantize_int8"] = """
WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
exploded AS (
  SELECT vec_id, i AS dim, v[i] AS x
  FROM corpus, UNNEST(range(1, len(v)::BIGINT + 1)) t(i)
),
scales AS (SELECT dim, MAX(ABS(x)) / 127.0 AS s FROM exploded GROUP BY dim),
quant AS (
  SELECT e.vec_id, e.dim,
         CASE WHEN s.s = 0 THEN 0
              WHEN e.x >= 0 THEN CAST(FLOOR(e.x / s.s + 0.5) AS BIGINT)
              ELSE -CAST(FLOOR(-e.x / s.s + 0.5) AS BIGINT) END AS q
  FROM exploded e JOIN scales s USING (dim)
)
SELECT vec_id,
       string_agg(CAST(q AS VARCHAR), ',' ORDER BY dim) AS q_csv,
       CAST(SUM(ABS(q)) AS BIGINT) AS q_l1
FROM quant GROUP BY vec_id"""


# ---------------------------------------------------------------------------
# docs_blocklist_filter — C4-style badwords blocklist pass
# ---------------------------------------------------------------------------

_BLOCKLIST_RE = r"\b(slow|dup|lag)\b"


def q_docs_blocklist_filter(sf_dir: str):
    """Blocklist filtering (the C4 badwords pass, Raffel et al. 2020 §2.2):
    count word-boundary blocklist hits per document and flag keep = no hits.
    Stateless, zero shuffles; ONE Arrow RE2 count kernel per batch — DuckDB's
    regexp_extract_all is the same RE2, so counts replay exactly."""
    import pyarrow.compute as pc

    def score(t: pa.Table) -> pa.Table:
        hits = pc.cast(
            pc.count_substring_regex(t["text"], pattern=_BLOCKLIST_RE), pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bad_hits": hits,
                "keep": pc.equal(hits, 0),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


ORACLES32["docs_blocklist_filter"] = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BLOCKLIST_RE}')) AS BIGINT) AS bad_hits,
       len(regexp_extract_all(text, '{_BLOCKLIST_RE}')) = 0 AS keep
FROM documents"""


QUERIES32 = {
    "emb_quantize_int8": q_emb_quantize_int8,
    "docs_blocklist_filter": q_docs_blocklist_filter,
}
