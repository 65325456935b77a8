"""Driver-contract queries, wave 34 — weighted sampling WITHOUT replacement
(the Efraimidis–Spirakis exponential race, deterministic) and T5-style span
corruption masking (the seq2seq denoising objective's mask layout). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries10 import _fnv32_sql

ORACLES34: dict[str, str] = {}

_WSK_K = 20  # sample size

# span-corruption policy constants (T5: ~15% corruption, mean span 3;
# deterministic analogue: 1-in-7 span starts, span length 1..3)
_SC_START_MOD = 7
_SC_LEN_MOD = 3


# ---------------------------------------------------------------------------
# orders_weighted_sample_k — weighted k-sample without replacement
# ---------------------------------------------------------------------------


def q_orders_weighted_sample_k(sf_dir: str):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006, the
    exponential-race form): each row draws key = -ln(u)/w with u a
    deterministic hash-uniform and w = o_totalprice; the k smallest keys are
    exactly a weighted sample without replacement. Zero RNG state — rerun- and
    partition-stable. Per-batch top-k combiner → bounded k×blocks driver
    merge (the uniform_sample_k shape with a weighted key); ties break by
    orderkey on both sides. Output: the sampled (o_orderkey, o_totalprice)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    def topk_partial(t: pa.Table) -> pa.Table:
        w = t["o_totalprice"].to_numpy(zero_copy_only=False)
        h = fnv1a32_arrow(pc.cast(t["o_orderkey"], pa.string()))
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        key = -np.log(u) / w
        if len(key) > _WSK_K:
            idx = np.argpartition(key, _WSK_K)[:_WSK_K]
        else:
            idx = np.arange(len(key))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].take(pa.array(idx)),
                "o_totalprice": t["o_totalprice"].take(pa.array(idx)),
                "key": pa.array(key[idx]),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        .map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: k rows per block
    )
    final = parts.sort_values(["key", "o_orderkey"], kind="mergesort").head(_WSK_K)
    return (
        final[["o_orderkey", "o_totalprice"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


ORACLES34["orders_weighted_sample_k"] = f"""
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
         -ln(({_fnv32_sql("CAST(o_orderkey AS VARCHAR)")} + 0.5) / 4294967296.0)
           / o_totalprice AS key
  FROM orders)
ORDER BY key, o_orderkey LIMIT {_WSK_K}"""


# ---------------------------------------------------------------------------
# docs_span_corruption — T5-style deterministic span-mask layout
# ---------------------------------------------------------------------------


def q_docs_span_corruption(sf_dir: str):
    """Span-corruption mask layout (Raffel et al. 2020 §3.1.4, the T5
    denoising objective): token i starts a masked span iff
    fnv32(doc_id:i) % 7 == 0, the span covers 1 + fnv32(doc_id:i:L) % 3
    tokens (clipped at doc end), and the mask is the UNION of spans
    (overlaps merge, as in the reference implementation's contiguous-span
    collapse). Deterministic — no RNG state, partition-independent.

    Fully vectorized: one split per batch, flat (row, pos) token stream,
    hash → starts → span explode via repeat/arange, per-doc dedup through a
    single np.unique over packed 64-bit (row, pos) keys, csv assembly with
    ListArray + binary_join. Stateless map_batches — zero shuffles."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    def mask_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        n_per = pc.list_value_length(toks).to_numpy().astype(np.int64)
        m_rows = len(t)
        offs = np.concatenate([[0], np.cumsum(n_per)])
        total = int(offs[-1])
        row_idx = np.repeat(np.arange(m_rows, dtype=np.int64), n_per)
        pos = np.arange(total, dtype=np.int64) - offs[row_idx]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)

        doc_str = pc.cast(pa.array(doc_ids[row_idx]), pa.string())
        pos_str = pc.cast(pa.array(pos), pa.string())
        key = pc.binary_join_element_wise(doc_str, pos_str, ":")
        h = fnv1a32_arrow(key)
        is_start = (h % np.uint64(_SC_START_MOD) == 0).astype(bool)

        r_s = row_idx[is_start]
        p_s = pos[is_start]
        key_l = pc.binary_join_element_wise(
            pa.array(np.asarray(key)[is_start], pa.string()), "L", ":"
        )
        span_len = 1 + (fnv1a32_arrow(key_l) % np.uint64(_SC_LEN_MOD)).astype(
            np.int64
        )

        reps = span_len
        r_m = np.repeat(r_s, reps)
        starts_rep = np.repeat(p_s, reps)
        base = np.repeat(np.cumsum(reps) - reps, reps)
        j = np.arange(int(reps.sum()), dtype=np.int64) - base
        m = starts_rep + j
        valid = m < n_per[r_m]
        r_m, m = r_m[valid], m[valid]

        packed = np.unique(r_m * np.int64(1 << 32) + m)
        r_u = packed >> 32
        m_u = packed & np.int64(0xFFFFFFFF)
        cnt = np.bincount(r_u, minlength=m_rows).astype(np.int64)
        flat = pc.cast(pa.array(m_u), pa.string())
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        )
        csv = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), ",")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_per),
                "n_masked": pa.array(cnt),
                "mask_csv": csv,
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(mask_batch, batch_format="pyarrow")


_SC_START_HASH = _fnv32_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
_SC_LEN_HASH = _fnv32_sql(
    "CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':L'"
)

ORACLES34["docs_span_corruption"] = f"""
WITH base AS (
  SELECT doc_id, len(string_split(coalesce(text, ''), ' ')) AS n FROM documents
),
idx AS (
  SELECT doc_id, n, CAST(i AS BIGINT) AS i
  FROM base, UNNEST(range(0, n)) t(i)
),
starts AS (
  SELECT doc_id, n, i, 1 + {_SC_LEN_HASH} % {_SC_LEN_MOD} AS L
  FROM idx WHERE {_SC_START_HASH} % {_SC_START_MOD} = 0
),
masked AS (
  SELECT DISTINCT doc_id, i + j AS m
  FROM starts, UNNEST(range(0, L)) s(j)
  WHERE i + j < n
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked,
         string_agg(CAST(m AS VARCHAR), ',' ORDER BY m) AS mask_csv
  FROM masked GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
       COALESCE(a.n_masked, 0) AS n_masked,
       COALESCE(a.mask_csv, '') AS mask_csv
FROM base b LEFT JOIN agg a USING (doc_id)"""


QUERIES34 = {
    "orders_weighted_sample_k": q_orders_weighted_sample_k,
    "docs_span_corruption": q_docs_span_corruption,
}
