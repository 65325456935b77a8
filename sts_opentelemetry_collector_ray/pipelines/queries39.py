"""Driver-contract queries, wave 39 — histogram-quantile extraction over the
service-graph latency histogram (the Prometheus `histogram_quantile()`
semantics: linear interpolation within the target explicit bucket) and
deterministic word-dropout augmentation (the EDA text-augmentation recipe).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries10 import _fnv32_sql
from .queries2 import _BOUNDS_SQL, _EDGES_SQL, _parsed_transcripts

ORACLES39: dict[str, str] = {}

_HQ_QS = [(0.50, "p50"), (0.95, "p95"), (0.99, "p99")]
_WD_MOD = 10  # drop 1-in-10 tokens


# ---------------------------------------------------------------------------
# sg_latency_quantiles — histogram_quantile over explicit bounds
# ---------------------------------------------------------------------------


def q_sg_latency_quantiles(sf_dir: str):
    """Prometheus `histogram_quantile()` re-expression over the A2
    explicit-bounds histogram (promql/quantile.go semantics): rank = q·total,
    the target bucket is the first with cumulative ≥ rank, and the value
    interpolates linearly inside it — lower + (upper−lower)·(rank−below)/n,
    with lower = 0 for the first bucket and the +Inf bucket clamping to the
    largest finite bound.

    The distributed work IS the oracled histogram (`latency_histogram`, a
    bounded tools×buckets aggregate); the quantile extraction runs on that
    bounded grid with float ops in the exact SQL order. Output: tool, label,
    value_micro (µs, BIGINT)."""
    from ..stages.servicegraph import (
        DEFAULT_LATENCY_BOUNDS,
        edge_table,
        latency_histogram,
    )

    bounds = np.array(DEFAULT_LATENCY_BOUNDS, dtype=np.float64)
    hist = (
        latency_histogram(edge_table(_parsed_transcripts(sf_dir)))
        .to_pandas()  # bounded: tools × (len(bounds)+1)
        .sort_values(["tool", "bucket_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    rows = []
    for tool, g in hist.groupby("tool", sort=True):
        idxs = g["bucket_idx"].to_numpy()
        ns = g["n"].to_numpy().astype(np.int64)
        cum = np.cumsum(ns)
        total = int(cum[-1])
        for q, label in _HQ_QS:
            rank = q * float(total)
            j = int(np.argmax(cum >= rank))  # first bucket with cum >= rank
            b = int(idxs[j])
            if b >= len(bounds):
                val = float(bounds[-1])  # +Inf bucket clamps
            else:
                lower = 0.0 if b == 0 else float(bounds[b - 1])
                upper = float(bounds[b])
                below = float(cum[j] - ns[j])
                val = lower + (upper - lower) * (rank - below) / float(ns[j])
            rows.append((tool, label, np.int64(np.floor(val * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["tool", "label", "value_micro"]).astype(
        {"value_micro": np.int64}
    )


def _hq_oracle() -> str:
    qs_values = " UNION ALL ".join(
        f"SELECT {q} AS q, '{label}' AS label" for q, label in _HQ_QS
    )
    return (
        _EDGES_SQL
        + f""",
hist AS (
  SELECT tool,
         CAST(len(list_filter({_BOUNDS_SQL}, b -> b < latency_us / 1000000.0))
              AS BIGINT) AS bucket_idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM edges GROUP BY 1, 2
),
cum AS (
  SELECT tool, bucket_idx, n,
         SUM(n) OVER (PARTITION BY tool ORDER BY bucket_idx) AS c,
         SUM(n) OVER (PARTITION BY tool) AS total
  FROM hist
),
qs(q, label) AS ({qs_values}),
pick AS (
  SELECT tool, label, q, bucket_idx, n, c, total,
         row_number() OVER (PARTITION BY tool, label ORDER BY bucket_idx) AS r
  FROM cum CROSS JOIN qs
  WHERE c >= q * total
),
vals AS (
  SELECT tool, label,
         CASE WHEN bucket_idx >= len({_BOUNDS_SQL})
              THEN {_BOUNDS_SQL}[len({_BOUNDS_SQL})]
              ELSE (CASE WHEN bucket_idx = 0 THEN 0.0
                         ELSE {_BOUNDS_SQL}[bucket_idx] END)
                   + ({_BOUNDS_SQL}[bucket_idx + 1]
                      - CASE WHEN bucket_idx = 0 THEN 0.0
                             ELSE {_BOUNDS_SQL}[bucket_idx] END)
                     * (q * total - (c - n)) / n
         END AS val
  FROM pick WHERE r = 1
)
SELECT tool, label,
       CAST(floor(val * 1000000 + 0.5) AS BIGINT) AS value_micro
FROM vals"""
    )


ORACLES39["sg_latency_quantiles"] = _hq_oracle()


# ---------------------------------------------------------------------------
# docs_word_dropout — deterministic EDA word-dropout augmentation
# ---------------------------------------------------------------------------


def q_docs_word_dropout(sf_dir: str):
    """Word-dropout augmentation (Wei & Zou 2019 EDA random-deletion, made
    deterministic): token i drops iff fnv32(doc_id:i:D) % 10 == 0; the
    augmented text is the kept tokens re-joined. Zero RNG state —
    partition-independent, rerun-stable.

    Fully vectorized: the span_corruption flat-token machinery with a keep
    mask; per-doc re-join via ListArray offsets + binary_join. Stateless
    map_batches, zero shuffles."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    def dropout(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = pc.list_value_length(toks).to_numpy().astype(np.int64)
        m_rows = len(t)
        offs = np.concatenate([[0], np.cumsum(n_per)])
        row_idx = np.repeat(np.arange(m_rows, dtype=np.int64), n_per)
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[row_idx]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)

        key = pc.binary_join_element_wise(
            pc.cast(pa.array(doc_ids[row_idx]), pa.string()),
            pc.cast(pa.array(pos), pa.string()),
            "D",
            ":",
        )
        drop = fnv1a32_arrow(key) % np.uint64(_WD_MOD) == 0
        keep = ~drop

        flat = toks.flatten()
        kept = flat.filter(pa.array(keep))
        kept_cnt = np.bincount(row_idx[keep], minlength=m_rows).astype(np.int64)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(kept_cnt)]).astype(np.int32)
        )
        aug = pc.binary_join(pa.ListArray.from_arrays(offsets, kept), " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_per),
                "n_kept": pa.array(kept_cnt),
                "aug_text": aug,
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(dropout, batch_format="pyarrow")


_WD_HASH = _fnv32_sql(
    "CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR) || ':D'"
)

ORACLES39["docs_word_dropout"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk FROM documents
),
flat AS (
  SELECT doc_id, len(tk) AS n, tk[i] AS tok, CAST(i AS BIGINT) AS i
  FROM toks, UNNEST(range(1, len(tk)::BIGINT + 1)) t(i)
),
kept AS (
  SELECT doc_id, n, tok, i FROM flat WHERE {_WD_HASH} % {_WD_MOD} <> 0
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY i) AS aug_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.aug_text, '') AS aug_text
FROM toks t LEFT JOIN agg a USING (doc_id)"""


QUERIES39 = {
    "sg_latency_quantiles": q_sg_latency_quantiles,
    "docs_word_dropout": q_docs_word_dropout,
}
