"""Driver-contract queries, wave 161 — token commonness by source: score
every token by its rank in the global top-1000 vocabulary (rank 1 = most
frequent; ties break (count DESC, word ASC); anything outside the budget
counts as rank 1001 and as OOV), then report per source the exact token
count, average rank in micro units, and OOV share — the
corpus-"basicness" profile that separates boilerplate feeds from long-tail
ones. Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES161: dict[str, str] = {}

_RANK_BUDGET = 1000
_OOV_RANK = _RANK_BUDGET + 1


# ---------------------------------------------------------------------------
# docs_commonness_by_source — avg global word rank + OOV share per source
# ---------------------------------------------------------------------------


def q_docs_commonness_by_source(sf_dir: str):
    """Two passes, both streaming: (1) the docs_vocab wordcount combiner +
    word-hash bucket exchange yields global counts, and only the top-1000
    (count DESC, word) ranks return to the driver; (2) the rank table
    broadcasts via ``ray.put`` and a per-batch searchsorted lookup scores
    every token, folding to per-source (n_tokens, sum_rank, n_oov) — the
    corpus never materializes and the rank side is bounded by the budget.

    Tokenization matches docs_vocab: lowercase, whitespace split, drop
    empties."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"w": flat}).group_by(["w"]).aggregate([([], "count_all")])
        df = pd.DataFrame(
            {
                "w": np.asarray(g["w"].to_numpy(zero_copy_only=False)),
                "n": g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        h = fnv1a32_arrow(pa.array(df["w"], type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df

    def wc_merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("w", sort=False, as_index=False)["n"].sum()
        # per-bucket local top under the GLOBAL key: safe superset
        return tot.sort_values(
            ["n", "w"], ascending=[False, True], kind="mergesort"
        ).head(_RANK_BUDGET)

    top = (
        ds.map_batches(wc_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(wc_merge, batch_format="pandas")
        .to_pandas()  # bounded: <= 64 × 1000 candidate rows
    )
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "n_tokens": pd.Series([], dtype=np.int64),
            "avg_rank_micro": pd.Series([], dtype=np.int64),
            "oov_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if top.empty or "w" not in top.columns:
        return empty
    top = (
        top.sort_values(["n", "w"], ascending=[False, True], kind="mergesort")
        .head(_RANK_BUDGET)
        .reset_index(drop=True)
    )
    words = top["w"].to_numpy(object).astype("U")
    ranks = np.arange(1, len(top) + 1, dtype=np.int64)
    order = np.argsort(words)
    ref = ray.put((words[order], ranks[order]))

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def score(t: pa.Table) -> pd.DataFrame:
        sw, sr = ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False)).astype("U")
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False)), lens
        )
        keep = flat != ""
        flat, src = flat[keep], src[keep]
        idx = np.searchsorted(sw, flat)
        idx = np.minimum(idx, len(sw) - 1)
        hit = sw[idx] == flat
        rank = np.where(hit, sr[idx], np.int64(_OOV_RANK))
        g = (
            pd.DataFrame(
                {
                    "source": src,
                    "n": 1,
                    "sum_rank": rank,
                    "oov": (~hit).astype(np.int64),
                }
            )
            .groupby("source", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "sum_rank": np.int64, "oov": np.int64})

    part = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    if part.empty:
        return empty
    out = (
        part.groupby("source", sort=True)
        .agg(n_tokens=("n", "sum"), sum_rank=("sum_rank", "sum"), oov=("oov", "sum"))
        .reset_index()
    )
    n = out["n_tokens"].to_numpy(np.int64)
    out["avg_rank_micro"] = np.floor(
        out["sum_rank"].to_numpy(np.float64) / n.astype(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    out["oov_share_micro"] = np.floor(
        out["oov"].to_numpy(np.float64) / n.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out[["source", "n_tokens", "avg_rank_micro", "oov_share_micro"]].astype(
        {"n_tokens": np.int64}
    )


ORACLES161["docs_commonness_by_source"] = rf"""
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
g AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
r AS (
  SELECT w, row_number() OVER (ORDER BY n DESC, w) AS rank
  FROM g QUALIFY rank <= {_RANK_BUDGET}
),
scored AS (
  SELECT w.source,
         coalesce(r.rank, {_OOV_RANK}) AS rank,
         CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END AS oov
  FROM w LEFT JOIN r USING (w)
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(rank) AS BIGINT) AS sum_rank,
         CAST(sum(oov) AS BIGINT) AS n_oov
  FROM scored GROUP BY 1
)
SELECT source, n_tokens,
       CAST(floor(CAST(sum_rank AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_rank_micro,
       CAST(floor(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS oov_share_micro
FROM s"""


QUERIES161 = {
    "docs_commonness_by_source": q_docs_commonness_by_source,
}
