"""Driver-contract queries, wave 136 — vocabulary coverage curve (what share
of corpus tokens a top-N vocabulary covers, the tokenizer-sizing diagnostic)
and customer l-diversity (per quasi-identifier group, how many distinct
sensitive values co-exist — the privacy audit that complements
customer_k_anonymity). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES136: dict[str, str] = {}

_COVERAGE_THRESHOLDS = (100, 1000, 10000)


# ---------------------------------------------------------------------------
# docs_vocab_coverage — corpus token mass covered by a top-N vocabulary
# ---------------------------------------------------------------------------


def q_docs_vocab_coverage(sf_dir: str):
    """For each vocabulary budget N in (100, 1000, 10000): the number of types
    actually available (min(N, |vocab|)), the exact token mass the top-N
    types cover under the (count DESC) ordering, the corpus total, and the
    coverage share in micro units. Count ties need no tie-break: every type
    in a tie class has the same count, so the covered MASS is invariant to
    which tie members enter the budget — the curve is exact while word
    identity never matters. Tokenization matches docs_vocab: lowercase,
    split on whitespace runs, drop empties.

    Scale shape: per-batch Arrow wordcount combiner, ONE word-hash bucket
    exchange (a word's partials co-locate, so per-word totals are exact),
    per-bucket re-reduce COMPRESSED to a (count_value -> n_types) histogram —
    bounded by distinct count values, not vocabulary size — and the driver
    folds histograms and walks the cumulative curve. Words never reach the
    driver."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = (
            pa.table({"w": flat})
            .group_by(["w"])
            .aggregate([([], "count_all")])
        )
        df = pd.DataFrame(
            {
                "w": np.asarray(g["w"].to_numpy(zero_copy_only=False)),
                "n": g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        h = fnv1a32_arrow(pa.array(df["w"], type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("w", sort=False)["n"].sum()
        hist = tot.value_counts().rename_axis("cnt").reset_index(name="types")
        return hist.astype({"cnt": np.int64, "types": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: distinct count VALUES per bucket, not words
    )
    empty = pd.DataFrame(
        {
            "budget": pd.Series([], dtype=np.int64),
            "n_types": pd.Series([], dtype=np.int64),
            "covered_tokens": pd.Series([], dtype=np.int64),
            "total_tokens": pd.Series([], dtype=np.int64),
            "coverage_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "cnt" not in part.columns:
        return empty
    hist = (
        part.groupby("cnt", sort=False)["types"].sum().reset_index()
    ).sort_values("cnt", ascending=False, kind="mergesort")
    cnt = hist["cnt"].to_numpy(np.int64)
    types = hist["types"].to_numpy(np.int64)
    cum_types = np.cumsum(types)
    total_types = int(cum_types[-1])
    total_tokens = int(np.sum(cnt * types))
    rows = []
    for budget in _COVERAGE_THRESHOLDS:
        take = np.minimum(
            types, np.maximum(0, budget - (cum_types - types))
        )
        covered = int(np.sum(cnt * take))
        rows.append(
            (
                budget,
                min(budget, total_types),
                covered,
                total_tokens,
                int(
                    np.floor(
                        covered / float(total_tokens) * 1_000_000.0 + 0.5
                    )
                ),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "budget",
            "n_types",
            "covered_tokens",
            "total_tokens",
            "coverage_micro",
        ],
    ).astype(np.int64)


ORACLES136["docs_vocab_coverage"] = r"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
g AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
h AS (SELECT n AS cnt, CAST(count(*) AS BIGINT) AS types FROM g GROUP BY 1),
c AS (
  SELECT cnt, types,
         sum(types) OVER (ORDER BY cnt DESC) AS cum_types,
         sum(cnt * types) OVER (ORDER BY cnt DESC) AS cum_tokens
  FROM h
),
tot AS (
  SELECT CAST(sum(cnt * types) AS BIGINT) AS total_tokens,
         CAST(sum(types) AS BIGINT) AS total_types
  FROM h
),
b AS (SELECT unnest([100, 1000, 10000]) AS budget),
cov AS (
  SELECT b.budget,
         CAST(sum(c.cnt * least(c.types,
                                greatest(0, b.budget - (c.cum_types - c.types))))
              AS BIGINT) AS covered_tokens
  FROM b CROSS JOIN c GROUP BY 1
)
SELECT CAST(b.budget AS BIGINT) AS budget,
       CAST(least(b.budget, tot.total_types) AS BIGINT) AS n_types,
       cov.covered_tokens,
       tot.total_tokens,
       CAST(floor(CAST(cov.covered_tokens AS DOUBLE)
                  / CAST(tot.total_tokens AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS coverage_micro
FROM b JOIN cov USING (budget) CROSS JOIN tot"""


# ---------------------------------------------------------------------------
# customer_l_diversity — distinct sensitive values per quasi-identifier group
# ---------------------------------------------------------------------------


def q_customer_l_diversity(sf_dir: str):
    """Privacy audit: with quasi-identifiers (c_nationkey, c_mktsegment) and
    the sensitive attribute bucketed as floor(c_acctbal / 1000) (thousands
    of account balance, negative balances land in -1), report per QI group
    the member count and the distinct-l-diversity (distinct sensitive
    buckets); a group where l = 1 leaks its members' balance band outright.

    Scale shape: per-batch distinct (nation, segment, sbucket) triples plus
    (nation, segment, n) count partials — both bounded by |nations| ×
    |segments| × |buckets| — fold on the driver; no shuffle at all."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_acctbal", "c_mktsegment"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        sb = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 1000.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "c_nationkey": t["c_nationkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int32),
                "c_mktsegment": np.asarray(
                    t["c_mktsegment"].to_numpy(zero_copy_only=False)
                ),
                "sb": sb,
            }
        )
        g = (
            df.groupby(["c_nationkey", "c_mktsegment", "sb"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g.astype({"n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "c_nationkey": pd.Series([], dtype=np.int32),
            "c_mktsegment": pd.Series([], dtype=object),
            "n_customers": pd.Series([], dtype=np.int64),
            "l_diversity": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    fold = (
        part.groupby(["c_nationkey", "c_mktsegment", "sb"], sort=False)["n"]
        .sum()
        .reset_index()
    )
    out = (
        fold.groupby(["c_nationkey", "c_mktsegment"], sort=True)
        .agg(n_customers=("n", "sum"), l_diversity=("sb", "nunique"))
        .reset_index()
    )
    return out.astype(
        {
            "c_nationkey": np.int32,
            "n_customers": np.int64,
            "l_diversity": np.int64,
        }
    )


ORACLES136["customer_l_diversity"] = """
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sb
  FROM customer
)
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT sb) AS BIGINT) AS l_diversity
FROM s GROUP BY 1, 2"""


QUERIES136 = {
    "docs_vocab_coverage": q_docs_vocab_coverage,
    "customer_l_diversity": q_customer_l_diversity,
}
