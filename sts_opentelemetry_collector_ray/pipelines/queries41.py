"""Driver-contract queries, wave 41 — k-anonymity audit over quasi-identifier
groups (the privacy-compliance check) and content-defined chunking dedup
estimation (the storage-dedup / backup-system measurement: Rabin-style
boundaries, chunk-hash dedup ratio). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES41: dict[str, str] = {}

_KA_K = 5  # anonymity threshold

_CDC_WIN = 4  # boundary window bytes
_CDC_MOD = 16  # boundary probability 1/16 → mean chunk ~16 bytes + window
_CDC_HASH_BUCKETS = 64

_FNV32_BASIS = 2166136261
_FNV32_PRIME = 16777619


# ---------------------------------------------------------------------------
# customer_k_anonymity — quasi-identifier group-size audit
# ---------------------------------------------------------------------------


def q_customer_k_anonymity(sf_dir: str):
    """k-anonymity audit (Sweeney 2002): group the table by its
    quasi-identifiers (nation, market segment) and flag groups smaller than
    k=5 — each such group is a re-identification risk. One bounded
    (QI, count) combiner exchange; rows never shuffle."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["c_nationkey", "c_mktsegment"])
            .group_by(["c_nationkey", "c_mktsegment"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["c_nationkey", "c_mktsegment", "pn"])

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ nations×segments rows per block
    )
    out = (
        parts.groupby(["c_nationkey", "c_mktsegment"])["pn"]
        .sum()
        .rename("group_n")
        .reset_index()
    )
    out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
    out["group_n"] = out["group_n"].astype(np.int64)
    out["anonymous"] = out["group_n"] >= _KA_K
    return out


ORACLES41["customer_k_anonymity"] = f"""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS group_n,
       count(*) >= {_KA_K} AS anonymous
FROM customer GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# docs_cdc_dedup — content-defined chunking storage-dedup estimate
# ---------------------------------------------------------------------------


def q_docs_cdc_dedup(sf_dir: str):
    """Content-defined chunking dedup estimation (the backup/storage-dedup
    measurement, Muthitacharoen et al. 2001 LBFS): a chunk boundary falls
    AFTER byte i whenever the FNV-1a32 of the trailing 4-byte window divides
    by 16 — insertions shift boundaries only locally, so shared content
    chunks identically across documents. Reported: total chunks, distinct
    chunks (by FNV-64 of chunk bytes + length), total vs unique bytes — the
    dedup ratio a chunk store would achieve.

    Vectorized end to end: boundaries via 4 fused numpy passes over the flat
    Arrow byte buffer (no per-doc loop), chunk hashes from the same buffer;
    the exchange carries (hash, len) pairs — 16 B per chunk, text never
    moves; ONE hash-bucket exchange dedups globally; driver residue is one
    scalar row per bucket."""
    import pyarrow.compute as pc

    from ..functions.hashing import _arrow_string_bytes

    path = f"{sf_dir}/documents.parquet"

    def chunk_partial(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        data, starts, lens = _arrow_string_bytes(arr)
        n_docs = len(starts)
        if len(data) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "ln": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int32()),
                }
            )
        # rolling 4-byte FNV-1a32 at every byte position (fused passes)
        d64 = data.astype(np.uint64)
        h = np.full(len(data), np.uint64(_FNV32_BASIS))
        for k in range(_CDC_WIN):
            idx = np.arange(len(data)) - (_CDC_WIN - 1 - k)
            b = d64[np.maximum(idx, 0)]
            h = ((h ^ b) * np.uint64(_FNV32_PRIME)) % np.uint64(2**32)
        # boundary AFTER position i (0-based within doc, i ≥ WIN-1)
        doc_of = np.repeat(np.arange(n_docs), lens)
        pos_in = np.arange(len(data)) - np.repeat(starts, lens)
        is_boundary = (h % np.uint64(_CDC_MOD) == 0) & (pos_in >= _CDC_WIN - 1)
        # chunk ends: boundary positions plus each NON-EMPTY doc's last byte
        doc_last = (starts + lens - 1)[lens > 0]
        end_idx = np.union1d(np.flatnonzero(is_boundary), doc_last)
        end_doc = doc_of[end_idx]
        # chunk starts: doc start or previous boundary + 1
        prev_end = np.empty_like(end_idx)
        prev_end[1:] = end_idx[:-1]
        prev_end[0] = -1
        first_of_doc = np.concatenate(
            [[True], end_doc[1:] != end_doc[:-1]]
        )
        start_idx = np.where(first_of_doc, starts[end_doc], prev_end + 1)
        ln = (end_idx - start_idx + 1).astype(np.int64)
        # FNV-1a64 of each chunk's bytes — vectorized over chunk-length passes
        # bounded by the max chunk length (content-defined ⇒ short tail)
        ch = np.full(len(end_idx), np.uint64(14695981039346656037))
        width = int(ln.max())
        guard = len(data) - 1
        for k in range(width):
            live = k < ln
            b = d64[np.minimum(start_idx + k, guard)]
            # uint64 multiply wraps mod 2^64 natively
            ch = np.where(live, (ch ^ b) * np.uint64(1099511628211), ch)
        df = pd.DataFrame({"h": ch, "ln": ln})
        out = df.groupby(["h", "ln"], sort=False).size().rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        out["_b"] = (out["h"].to_numpy() % _CDC_HASH_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["h", "ln"], sort=False)["cnt"].sum().reset_index()
        return pd.DataFrame(
            {
                "n_chunks": [np.int64(agg["cnt"].sum())],
                "n_distinct": [np.int64(len(agg))],
                "bytes_total": [np.int64((agg["cnt"] * agg["ln"]).sum())],
                "bytes_unique": [np.int64(agg["ln"].sum())],
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(chunk_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: bucket_stats(g.drop(columns=["_b"])), batch_format="pandas"
        )
        .to_pandas()  # bounded: one row per bucket
    )
    tot = parts.sum()
    return pd.DataFrame(
        {
            "n_chunks": [np.int64(tot["n_chunks"])],
            "n_distinct": [np.int64(tot["n_distinct"])],
            "bytes_total": [np.int64(tot["bytes_total"])],
            "bytes_unique": [np.int64(tot["bytes_unique"])],
        }
    )


_CDC_WIN_HASH = (
    f"list_reduce(list_prepend({_FNV32_BASIS}::BIGINT, "
    "list_transform(string_split(substring(text, i - 3, 4), ''), "
    "c -> unicode(c)::BIGINT)), "
    f"(acc, x) -> (xor(acc, x) * {_FNV32_PRIME}) % 4294967296)"
)

_CDC_CHUNK_HASH = (
    "CASE WHEN chunk = '' THEN CAST(14695981039346656037 AS HUGEINT) "
    "ELSE CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
    "list_transform(string_split(chunk, ''), c -> unicode(c)::HUGEINT)), "
    "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) "
    "AS HUGEINT) END"
)

ORACLES41["docs_cdc_dedup"] = f"""
WITH pos AS (
  SELECT doc_id, text, CAST(i AS BIGINT) AS i
  FROM documents, UNNEST(range(4, strlen(text)::BIGINT + 1)) t(i)
),
bnd AS (
  SELECT doc_id, i FROM pos WHERE {_CDC_WIN_HASH} % {_CDC_MOD} = 0
),
ends AS (
  SELECT doc_id, i FROM bnd
  UNION
  SELECT doc_id, strlen(text)::BIGINT FROM documents WHERE strlen(text) > 0
),
spans AS (
  SELECT doc_id, i AS e,
         coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s
  FROM ends
),
chunks AS (
  SELECT substring(d.text, sp.s::INT, (sp.e - sp.s + 1)::INT) AS chunk
  FROM spans sp JOIN documents d USING (doc_id)
),
hashed AS (SELECT {_CDC_CHUNK_HASH} AS h, strlen(chunk)::BIGINT AS ln FROM chunks),
dist AS (SELECT h, ln, count(*) AS cnt FROM hashed GROUP BY 1, 2)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(SUM(cnt * ln) AS BIGINT) AS bytes_total,
       CAST(SUM(ln) AS BIGINT) AS bytes_unique
FROM dist"""


QUERIES41 = {
    "customer_k_anonymity": q_customer_k_anonymity,
    "docs_cdc_dedup": q_docs_cdc_dedup,
}
