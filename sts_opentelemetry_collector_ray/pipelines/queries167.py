"""Driver-contract queries, wave 167 — dedup vocabulary impact (how exact
dedup reweights the top words: raw token counts vs counts with each distinct
text counted once — boilerplate words collapse, content words survive) and
user value deciles (the whale table: per user-total decile, user counts and
value share). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES167: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_dedup_vocab_impact — top words raw vs distinct-text-weighted
# ---------------------------------------------------------------------------


def q_docs_dedup_vocab_impact(sf_dir: str):
    """For the top-10 words by RAW token count (count DESC, word): the raw
    count, the count with every distinct text counted ONCE (exact-dedup
    weighting), and the survival rate after/before in micro units — words
    that ride boilerplate crater, content words hold.

    Scale shape: per-batch (word, raw_n) plus per-batch DISTINCT-text word
    counts keyed through the text-hash bucket exchange — a distinct text's
    contribution resolves exactly in one bucket, then a word-hash re-reduce
    merges both weights; the driver merges ≤ 64×10 candidates under the
    global ordering key."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    # pass 1: distinct texts resolve in text-hash buckets; each bucket emits
    # per-word (raw, dedup) weight partials keyed by word hash.
    def text_partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "text": np.asarray(t["text"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                }
            )
            .groupby("text", sort=False, as_index=False)["n"]
            .sum()
        )
        h = fnv1a32_arrow(pa.array(g["text"], type=pa.string()))
        g["_b"] = (h % 64).astype(np.int64)
        return g.astype({"n": np.int64})

    def text_merge(g: pd.DataFrame) -> pd.DataFrame:
        per_text = g.groupby("text", sort=False, as_index=False)["n"].sum()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pa.array(per_text["text"], type=pa.string())), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        raw_w = np.repeat(per_text["n"].to_numpy(np.int64), lens)
        keep = flat != ""
        df = (
            pd.DataFrame({"w": flat[keep], "raw": raw_w[keep], "ded": 1})
            .groupby("w", sort=False, as_index=False)
            .sum()
        )
        h = fnv1a32_arrow(pa.array(df["w"], type=pa.string()))
        df["_b2"] = (h % 64).astype(np.int64)
        return df.astype({"raw": np.int64, "ded": np.int64})

    def word_merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("w", sort=False, as_index=False)[["raw", "ded"]].sum()
        return tot.sort_values(
            ["raw", "w"], ascending=[False, True], kind="mergesort"
        ).head(10)

    part = (
        ds.map_batches(text_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(text_merge, batch_format="pandas")
        .groupby("_b2")
        .map_groups(word_merge, batch_format="pandas")
        .to_pandas()  # bounded: <= 64 × 10 candidates
    )
    empty = pd.DataFrame(
        {
            "rank": pd.Series([], dtype=np.int64),
            "word": pd.Series([], dtype=object),
            "n_raw": pd.Series([], dtype=np.int64),
            "n_dedup": pd.Series([], dtype=np.int64),
            "survival_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "w" not in part.columns:
        return empty
    top = (
        part.sort_values(["raw", "w"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["survival_micro"] = np.floor(
        top["ded"].to_numpy(np.float64)
        / top["raw"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    top = top.rename(columns={"w": "word", "raw": "n_raw", "ded": "n_dedup"})
    return top[["rank", "word", "n_raw", "n_dedup", "survival_micro"]].astype(
        {"rank": np.int64, "n_raw": np.int64, "n_dedup": np.int64}
    )


ORACLES167["docs_dedup_vocab_impact"] = r"""
WITH per_text AS (
  SELECT text, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
),
w AS (
  SELECT u.w, per_text.n
  FROM per_text,
       unnest(list_filter(string_split_regex(lower(per_text.text), '\s+'),
                          x -> x <> '')) AS u(w)
),
g AS (
  SELECT w, CAST(sum(n) AS BIGINT) AS n_raw,
         CAST(count(*) AS BIGINT) AS n_dedup
  FROM w GROUP BY 1
),
r AS (
  SELECT w, n_raw, n_dedup,
         row_number() OVER (ORDER BY n_raw DESC, w) AS rk
  FROM g
)
SELECT CAST(rk AS BIGINT) AS rank, w AS word, n_raw, n_dedup,
       CAST(floor(CAST(n_dedup AS DOUBLE) / CAST(n_raw AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS survival_micro
FROM r WHERE rk <= 10"""


# ---------------------------------------------------------------------------
# users_value_deciles — value share by user-total decile
# ---------------------------------------------------------------------------


def q_users_value_deciles(sf_dir: str):
    """Per user-total decile (1 = lightest spenders, assigned by exact
    integer-rational cutoffs over the distinct-total-cents histogram, values
    at a cutoff belong to the LOWER decile): user count, exact value cents,
    and value share in micro units.

    Scale shape: per-batch (user, cents) combiner → user-bucket exchange
    completes totals → per-bucket distinct-total histogram partials; the
    driver derives cutoffs and folds the bounded histogram into deciles —
    users never sort globally."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "u": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "cents": cents,
                }
            )
            .groupby("u", sort=False, as_index=False)["cents"]
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("u", sort=False, as_index=False)["cents"].sum()
        return (
            tot.groupby("cents", sort=False)
            .size()
            .reset_index(name="cnt")
            .astype(np.int64)
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "decile": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "value_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "cents" not in part.columns:
        return empty
    hist = part.groupby("cents", sort=True)["cnt"].sum().reset_index()
    vals = hist["cents"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    cutoffs = []
    for d in range(1, 10):
        rank = (n * d + 9) // 10
        i = int(np.searchsorted(cum, rank, side="left"))
        cutoffs.append(int(vals[i]))
    cuts = np.asarray(cutoffs, dtype=np.int64)
    decile = np.searchsorted(cuts, vals, side="left") + 1
    # values equal to a cutoff belong to the LOWER decile: searchsorted-left
    # counts strictly-smaller cutoffs, matching the SQL count(cutoff < v)
    total_mass = int((vals * cnts).sum())
    out = (
        pd.DataFrame(
            {
                "decile": decile.astype(np.int64),
                "n_users": cnts,
                "sum_cents": vals * cnts,
            }
        )
        .groupby("decile", sort=True, as_index=False)
        .sum()
    )
    out["value_share_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64)
        / float(total_mass)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES167["users_value_deciles"] = """
WITH tot AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1
),
h AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM tot GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cents * cnt) AS BIGINT) AS mass FROM h),
cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM h),
cuts AS (
  SELECT d.d, min(cum.cents) AS cutoff
  FROM (SELECT unnest(range(1, 10)) AS d) d CROSS JOIN t
  JOIN cum ON cum.cum >= (t.n * d.d + 9) // 10
  GROUP BY 1
),
dec AS (
  SELECT h.cents, h.cnt,
         1 + coalesce((SELECT count(*) FROM cuts
                       WHERE cuts.cutoff < h.cents), 0) AS decile
  FROM h
),
g AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(sum(cnt) AS BIGINT) AS n_users,
         CAST(sum(cents * cnt) AS BIGINT) AS sum_cents
  FROM dec GROUP BY 1
)
SELECT decile, n_users, sum_cents,
       CAST(floor(CAST(sum_cents AS DOUBLE)
                  / CAST((SELECT mass FROM t) AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS value_share_micro
FROM g"""


QUERIES167 = {
    "docs_dedup_vocab_impact": q_docs_dedup_vocab_impact,
    "users_value_deciles": q_users_value_deciles,
}
