"""Driver-contract queries, wave 134 — per-document n-gram novelty against the
corpus's global first-seen order (the temporal-novelty / memorization screen
used in training-data curation: how much of each document's trigram content is
genuinely new at its position in doc_id order), and week-over-week behavioral
stability per user (adjacent-week Jaccard of each user's event-type set — the
cohort-stability companion to events_stickiness). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES134: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_ngram_novelty — per-doc trigram novelty vs global first-seen doc
# ---------------------------------------------------------------------------


def q_docs_ngram_novelty(sf_dir: str):
    """For each document with >= 3 tokens: the distinct word-trigram count,
    how many of those trigrams first appear (by min doc_id over the whole
    corpus) in THIS document, and the novelty share in micro units
    (floor-half-up; ONE double division over exact int64 counts).
    Tokenization matches docs_vocab: lowercase, split on whitespace runs,
    drop empties. Documents with < 3 tokens are absent on both engines.

    Scale shape: per-batch distinct (doc_id, trigram) pairs (trigrams join
    via ONE `pc.binary_join_element_wise` over the flattened token stream —
    no per-row Python), ONE trigram-hash bucket exchange (a trigram's doc set
    lands wholly in one bucket, so min-doc and first-flags resolve exactly
    per bucket — the conv_turn_dup_rate text-exchange precedent), per-bucket
    vectorized min-compare emits (doc_id, n, novel) partials that fold to the
    per-doc output. Trigram text never lands on the driver."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        flat, doc = flat[keep], doc[keep]
        if len(flat) < 3:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "tri": pd.Series([], dtype=object),
                    "_b": pd.Series([], dtype=np.int64),
                }
            )
        # trigram positions: three consecutive tokens from the SAME doc
        ok = (doc[:-2] == doc[1:-1]) & (doc[1:-1] == doc[2:])
        tri = pc.binary_join_element_wise(
            pa.array(flat[:-2][ok], type=pa.string()),
            pa.array(flat[1:-1][ok], type=pa.string()),
            pa.array(flat[2:][ok], type=pa.string()),
            " ",
        )
        df = pd.DataFrame(
            {
                "doc_id": doc[:-2][ok],
                "tri": np.asarray(tri.to_numpy(zero_copy_only=False)),
            }
        ).drop_duplicates(["doc_id", "tri"])
        h = fnv1a32_arrow(pa.array(df["tri"], type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df.astype({"doc_id": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["doc_id", "tri"])
        first = gg.groupby("tri", sort=False)["doc_id"].transform("min")
        novel = (gg["doc_id"] == first).to_numpy()
        out = (
            pd.DataFrame({"doc_id": gg["doc_id"], "n": 1, "novel": novel})
            .groupby("doc_id", sort=False)
            .agg(n=("n", "sum"), novel=("novel", "sum"))
            .reset_index()
        )
        return out.astype(
            {"doc_id": np.int64, "n": np.int64, "novel": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |docs| rows per bucket (per-doc partials)
    )
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "n_ngrams": pd.Series([], dtype=np.int64),
            "n_novel": pd.Series([], dtype=np.int64),
            "novelty_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "doc_id" not in part.columns:
        return empty
    fold = (
        part.groupby("doc_id", sort=True)
        .agg(n_ngrams=("n", "sum"), n_novel=("novel", "sum"))
        .reset_index()
    )
    fold["novelty_micro"] = np.floor(
        fold["n_novel"].to_numpy(np.float64)
        / fold["n_ngrams"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return fold.astype(
        {"doc_id": np.int64, "n_ngrams": np.int64, "n_novel": np.int64}
    )


ORACLES134["docs_ngram_novelty"] = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS words
  FROM documents
),
t AS (
  SELECT doc_id, words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS tri
  FROM w, unnest(range(1, len(words) - 1)) AS r(i)
  WHERE len(words) >= 3
),
d AS (SELECT DISTINCT doc_id, tri FROM t),
f AS (SELECT tri, min(doc_id) AS first_doc FROM d GROUP BY 1),
p AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN d.doc_id = f.first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM d JOIN f USING (tri) GROUP BY 1
)
SELECT doc_id, n_ngrams, n_novel,
       CAST(floor(CAST(n_novel AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS novelty_micro
FROM p"""


# ---------------------------------------------------------------------------
# users_week_stability — adjacent-week Jaccard of each user's event-type set
# ---------------------------------------------------------------------------


def q_users_week_stability(sf_dir: str):
    """Behavioral churn signal: for every user active in epoch-weeks w AND
    w+1, the Jaccard overlap of the two weeks' distinct event-type sets in
    micro units (per-user floor-half-up); output is per week_from: how many
    users qualify, the exact micro sum, and the average (ONE identical double
    floor on both engines). Weeks with no qualifying user are absent.

    Scale shape: per-batch distinct (user, week, type) triples, ONE
    user-bucket exchange (a user's triples co-locate, so set sizes and
    adjacent-week intersections resolve exactly per bucket — the stickiness
    precedent); only bounded (week, sum_micro, n_users) partials leave each
    bucket and fold on the driver."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        week = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
            // 7
        )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "week": week,
                "event_type": np.asarray(
                    t["event_type"].to_numpy(zero_copy_only=False)
                ),
            }
        ).drop_duplicates()
        h = fnv1a32_arrow(pa.array(df["user_id"].astype(str), type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df.astype({"user_id": np.int64, "week": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["user_id", "week", "event_type"])
        sz = (
            gg.groupby(["user_id", "week"], sort=False)
            .size()
            .reset_index(name="n")
        )
        nxt = gg.assign(week=gg["week"] - 1)
        inter = (
            gg.merge(nxt, on=["user_id", "week", "event_type"])
            .groupby(["user_id", "week"], sort=False)
            .size()
            .reset_index(name="ninter")
        )
        sz2 = sz.assign(week=sz["week"] - 1).rename(columns={"n": "n2"})
        p = sz.merge(sz2, on=["user_id", "week"])  # active in w AND w+1
        p = p.merge(inter, on=["user_id", "week"], how="left")
        ninter = p["ninter"].fillna(0).to_numpy(np.int64)
        union = p["n"].to_numpy(np.int64) + p["n2"].to_numpy(np.int64) - ninter
        micro = np.floor(
            ninter.astype(np.float64) / union.astype(np.float64) * 1_000_000.0
            + 0.5
        ).astype(np.int64)
        out = (
            pd.DataFrame({"week": p["week"], "micro": micro, "u": 1})
            .groupby("week", sort=False)
            .agg(sum_micro=("micro", "sum"), n_users=("u", "sum"))
            .reset_index()
        )
        return out.astype(
            {"week": np.int64, "sum_micro": np.int64, "n_users": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |weeks| rows per bucket
    )
    empty = pd.DataFrame(
        {
            "week": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
            "sum_jaccard_micro": pd.Series([], dtype=np.int64),
            "avg_jaccard_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "week" not in part.columns:
        return empty
    fold = (
        part.groupby("week", sort=True)
        .agg(
            sum_jaccard_micro=("sum_micro", "sum"), n_users=("n_users", "sum")
        )
        .reset_index()
    )
    fold["avg_jaccard_micro"] = np.floor(
        fold["sum_jaccard_micro"].to_numpy(np.float64)
        / fold["n_users"].to_numpy(np.float64)
        + 0.5
    ).astype(np.int64)
    return fold[["week", "n_users", "sum_jaccard_micro", "avg_jaccard_micro"]]


ORACLES134["users_week_stability"] = f"""
WITH e AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // {_DAY_US} // 7 AS week,
         event_type
  FROM events
),
sz AS (
  SELECT user_id, week, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2
),
iv AS (
  SELECT a.user_id, a.week, CAST(count(*) AS BIGINT) AS ninter
  FROM e a
  JOIN e b ON a.user_id = b.user_id AND b.week = a.week + 1
          AND a.event_type = b.event_type
  GROUP BY 1, 2
),
p AS (
  SELECT s1.user_id, s1.week, coalesce(iv.ninter, 0) AS ninter,
         s1.n AS n1, s2.n AS n2
  FROM sz s1
  JOIN sz s2 ON s1.user_id = s2.user_id AND s2.week = s1.week + 1
  LEFT JOIN iv ON iv.user_id = s1.user_id AND iv.week = s1.week
),
m AS (
  SELECT week,
         CAST(floor(CAST(ninter AS DOUBLE) / CAST(n1 + n2 - ninter AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT) AS micro
  FROM p
)
SELECT CAST(week AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(micro) AS BIGINT) AS sum_jaccard_micro,
       CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
         AS avg_jaccard_micro
FROM m GROUP BY 1"""


QUERIES134 = {
    "docs_ngram_novelty": q_docs_ngram_novelty,
    "users_week_stability": q_users_week_stability,
}
