"""Driver-contract queries, wave 142 — word-suffix census (top-20 3-char
suffixes by token mass: the cheap morphology probe used for stemmer/tokenizer
design and language forensics) and checkpointed PageRank (the iterative graph
engine run THROUGH its round-checkpoint path — proving the resumable variant
returns the exact ranks the oracle replays). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES142: dict[str, str] = {}

_SUF_TOPK = 20


# ---------------------------------------------------------------------------
# docs_suffix_census — top 3-char word suffixes by token mass
# ---------------------------------------------------------------------------


def q_docs_suffix_census(sf_dir: str):
    """Top-20 word suffixes (last 3 codepoints; whole word when shorter) by
    token occurrences, ranked (n DESC, suffix), with distinct word types per
    suffix and corpus token share in micro units. Tokenization matches
    docs_vocab: lowercase, split on whitespace runs, drop empties.

    Scale shape: per-batch Arrow suffix extraction (reverse → slice →
    reverse, all codepoint-exact kernels) + (suffix, tokens) combiner with a
    per-batch distinct (suffix, word) count, ONE suffix-hash bucket exchange
    — types resolve exactly per bucket because a word's suffix is a function
    of the word — per-bucket re-reduce + local top-20 under the global key
    with per-bucket totals; the driver merges ≤ 64×20 candidates."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        suf = pc.utf8_reverse(
            pc.utf8_slice_codeunits(pc.utf8_reverse(flat), 0, 3)
        )
        df = (
            pd.DataFrame(
                {
                    "suffix": np.asarray(suf.to_numpy(zero_copy_only=False)),
                    "word": np.asarray(flat.to_numpy(zero_copy_only=False)),
                    "n": 1,
                }
            )
            .groupby(["suffix", "word"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        h = fnv1a32_arrow(pa.array(df["suffix"], type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby(["suffix", "word"], sort=False)["n"].sum().reset_index()
        agg = (
            w.groupby("suffix", sort=False)
            .agg(n_tokens=("n", "sum"), n_types=("word", "count"))
            .reset_index()
        )
        tot = int(agg["n_tokens"].sum())
        top = agg.sort_values(
            ["n_tokens", "suffix"], ascending=[False, True], kind="mergesort"
        ).head(_SUF_TOPK)
        return top.assign(tot=tot).astype(
            {"n_tokens": np.int64, "n_types": np.int64, "tot": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: merge(g).assign(_b=g["_b"].iloc[0] if len(g) else -1),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: <= 64 buckets × 20 candidate rows
    )
    empty = pd.DataFrame(
        {
            "rank": pd.Series([], dtype=np.int64),
            "suffix": pd.Series([], dtype=object),
            "n_tokens": pd.Series([], dtype=np.int64),
            "n_types": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "suffix" not in part.columns:
        return empty
    total = int(part.drop_duplicates("_b")["tot"].sum())
    top = (
        part.sort_values(
            ["n_tokens", "suffix"], ascending=[False, True], kind="mergesort"
        )
        .head(_SUF_TOPK)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["share_micro"] = np.floor(
        top["n_tokens"].to_numpy(np.float64) / float(total) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return top[["rank", "suffix", "n_tokens", "n_types", "share_micro"]].astype(
        {"rank": np.int64, "n_tokens": np.int64, "n_types": np.int64}
    )


ORACLES142["docs_suffix_census"] = rf"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
s AS (
  SELECT CASE WHEN length(word) <= 3 THEN word
              ELSE substr(word, length(word) - 2, 3) END AS suffix,
         word
  FROM w
),
g AS (
  SELECT suffix, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT word) AS BIGINT) AS n_types
  FROM s GROUP BY 1
),
r AS (
  SELECT suffix, n_tokens, n_types,
         row_number() OVER (ORDER BY n_tokens DESC, suffix) AS rk
  FROM g
)
SELECT CAST(rk AS BIGINT) AS rank, suffix, n_tokens, n_types,
       CAST(floor(CAST(n_tokens AS DOUBLE)
                  / CAST((SELECT count(*) FROM w) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM r WHERE rk <= {_SUF_TOPK}"""


# ---------------------------------------------------------------------------
# graph_pagerank_checkpointed — the resumable path returns the oracled ranks
# ---------------------------------------------------------------------------


def q_graph_pagerank_checkpointed(sf_dir: str):
    """The SAME integer PageRank as graph_pagerank, but run through the
    round-checkpoint path (stages/graph.py): ranks persist per round under a
    scratch dir and the final state must equal the chained-CTE oracle —
    proving checkpointing never perturbs the arithmetic."""
    import tempfile

    from ray.data.aggregate import Count

    from ..stages.graph import pagerank_integer

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    l = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    edges = (
        l.join(
            o,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby(["o_custkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    ck = tempfile.mkdtemp(prefix="pr_ck_")
    return pagerank_integer(
        edges, src_col="o_custkey", dst_col="l_suppkey", checkpoint_dir=ck
    )


def _checkpointed_oracle() -> str:
    from .queries8 import _pagerank_oracle

    return _pagerank_oracle()


ORACLES142["graph_pagerank_checkpointed"] = _checkpointed_oracle()


QUERIES142 = {
    "docs_suffix_census": q_docs_suffix_census,
    "graph_pagerank_checkpointed": q_graph_pagerank_checkpointed,
}
