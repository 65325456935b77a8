"""Driver-contract queries, wave 322 — dedup survivorship per source
(who loses content under exact keep-one-by-min-id dedup) and positional
type-token diversity (is vocabulary front-loaded within documents?).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES322: dict[str, str] = {}

_DS_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_dedup_survivorship — who survives exact keep-one dedup
# ---------------------------------------------------------------------------


def q_docs_dedup_survivorship(sf_dir: str):
    """Survivorship audit of exact text dedup with the keep-one rule
    (minimum doc_id per identical text): per source, how many documents
    it contributes and how many survive. Sources systematically losing
    documents are being scooped by earlier crawls. Pure integer
    counting. Per source: source, n_docs, n_kept, kept_share_micro.

    Scale shape: (text-hash-bucketed) keep-one resolution via ONE
    bucket exchange keyed by the text hash; each bucket emits its
    |sources|-bounded census."""
    from ..functions.hashing import fnv1a64_array

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "source": np.asarray(
                    t["source"].to_numpy(zero_copy_only=False)
                ),
                "text": np.asarray(t["text"].to_numpy(zero_copy_only=False)),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["text"].to_numpy(object)) % np.uint64(
                _DS_BUCKETS
            )
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "k": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        keep_id = g.groupby("text")["doc_id"].transform("min")
        g = g.assign(kept=(g["doc_id"] == keep_id).astype(np.int64))
        out = g.groupby("source").agg(n=("kept", "size"), k=("kept", "sum"))
        return out.reset_index().astype({"n": np.int64, "k": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("source")[["n", "k"]]
        .sum()
        .sort_index()
    )
    cols = ["source", "n_docs", "n_kept", "kept_share_micro"]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    out = m.reset_index().rename(columns={"n": "n_docs", "k": "n_kept"})
    out["kept_share_micro"] = np.floor(
        out["n_kept"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols[1:]})[cols]


ORACLES322["docs_dedup_survivorship"] = """
WITH keep AS (
  SELECT doc_id, source,
         CAST(doc_id = min(doc_id) OVER (PARTITION BY text) AS BIGINT)
           AS kept
  FROM documents
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(kept) AS BIGINT) AS n_kept
  FROM keep GROUP BY 1
)
SELECT source, n_docs, n_kept,
       CAST(floor(CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS kept_share_micro
FROM agg
ORDER BY source"""


# ---------------------------------------------------------------------------
# docs_positional_ttr — vocabulary diversity by document thirds
# ---------------------------------------------------------------------------


def q_docs_positional_ttr(sf_dir: str):
    """Positional diversity: each document's token list (docs_vocab
    tokenizer) splits into thirds by position (k1 = len // 3,
    k2 = 2 len // 3); per third the corpus-level token count and
    DISTINCT type count give the third's type-token ratio. Per third:
    third, n_tokens, n_types, ttr_micro — front-loaded prose has a
    richer first third.

    Scale shape: per-batch (third, token) distinct partials ride the
    wordcount exchange; |3 x vocab| bounded."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        di = np.repeat(np.arange(len(lens)), lens)
        # position within each doc's token list
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(flat)) - starts[di]
        ln = lens[di]
        keep = flat != ""
        flat, pos, ln = flat[keep], pos[keep], ln[keep]
        # NOTE: thirds are over the RAW split list (empties included in
        # the length), mirroring the SQL list-slice convention below
        k1 = ln // 3
        k2 = (2 * ln) // 3
        third = np.where(pos < k1, 0, np.where(pos < k2, 1, 2)).astype(
            np.int64
        )
        df = pd.DataFrame({"third": third, "w": flat})
        g = df.groupby(["third", "w"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["third", "w"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["third", "n_tokens", "n_types", "ttr_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    agg = h.groupby("third")["c"].agg(n_tokens="sum", n_types="size")
    out = agg.reset_index()
    out["ttr_micro"] = np.floor(
        out["n_types"].to_numpy(np.float64)
        / out["n_tokens"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES322["docs_positional_ttr"] = r"""
WITH tl AS (
  SELECT string_split_regex(lower(text), '\s+') AS ws FROM documents
),
pos AS (
  SELECT unnest(ws) AS w,
         generate_subscripts(ws, 1) - 1 AS p,
         len(ws) AS ln
  FROM tl
),
third AS (
  SELECT w,
         CASE WHEN p < ln // 3 THEN 0
              WHEN p < (2 * ln) // 3 THEN 1
              ELSE 2 END AS third
  FROM pos WHERE w <> ''
),
agg AS (
  SELECT CAST(third AS BIGINT) AS third,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT w) AS BIGINT) AS n_types
  FROM third GROUP BY 1
)
SELECT third, n_tokens, n_types,
       CAST(floor(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS ttr_micro
FROM agg
ORDER BY third"""


QUERIES322 = {
    "docs_dedup_survivorship": q_docs_dedup_survivorship,
    "docs_positional_ttr": q_docs_positional_ttr,
}
