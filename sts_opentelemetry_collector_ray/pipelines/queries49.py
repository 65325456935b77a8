"""Driver-contract queries, wave 49 — A/B two-proportion z-test on conversion
(the experimentation-platform significance check, hash-assigned arms) and LIX
readability scoring (the corpus-filtering readability metric family). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries10 import _fnv32_sql

ORACLES49: dict[str, str] = {}

_AB_USER_BUCKETS = 32


# ---------------------------------------------------------------------------
# events_ab_ztest — two-proportion z-test on purchase conversion
# ---------------------------------------------------------------------------


def q_events_ab_ztest(sf_dir: str):
    """Two-proportion z-test (the A/B platform's significance readout): users
    hash-assign to arms (fnv32(user) % 2 — deterministic, the docs_split
    recipe), conversion = at least one 'purchase'; z uses the pooled-variance
    form. Counts exact; z is the only float, derived in the SQL expression
    order and micro-floored (DOUBLE on both sides).

    Per-batch (user, converted-any) OR partials → ONE user-bucket exchange →
    bounded (arm, n, conv) grid to the driver."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        conv = (
            pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "conv": conv})
        out = df.groupby("user_id", sort=False)["conv"].max().reset_index()
        out["conv"] = out["conv"].astype(np.int64)
        out["_b"] = (out["user_id"].to_numpy() % _AB_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def arms(g: pd.DataFrame) -> pd.DataFrame:
        users = g.groupby("user_id")["conv"].max().reset_index()
        h = fnv1a32_arrow(
            pa.array([str(u) for u in users["user_id"]], pa.string())
        )
        users["arm"] = (h % np.uint64(2)).astype(np.int64)
        out = users.groupby("arm").agg(
            n=("conv", "size"), conv=("conv", "sum")
        ).reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["conv"] = out["conv"].astype(np.int64)
        return out

    grid = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: arms(g.drop(columns=["_b"])), batch_format="pandas")
        .to_pandas()  # bounded: 2 rows per bucket
        .groupby("arm")
        .agg(n=("n", "sum"), conv=("conv", "sum"))
        .reindex([0, 1], fill_value=0)
    )
    na, nb = int(grid.loc[0, "n"]), int(grid.loc[1, "n"])
    ca, cb = int(grid.loc[0, "conv"]), int(grid.loc[1, "conv"])
    pa_, pb_ = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se2 = pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
    z = (pa_ - pb_) / np.sqrt(se2) if se2 > 0 else np.nan
    z_micro = float(np.floor(z * 1e6 + 0.5)) if np.isfinite(z) else np.nan
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "conv_a": [np.int64(ca)],
            "n_b": [np.int64(nb)],
            "conv_b": [np.int64(cb)],
            "z_micro": [np.float64(z_micro)],
        }
    )


_AB_ARM = f"{_fnv32_sql('CAST(user_id AS VARCHAR)')} % 2"

ORACLES49["events_ab_ztest"] = f"""
WITH u AS (
  SELECT user_id, {_AB_ARM} AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
         CAST(SUM(conv) FILTER (arm = 0) AS BIGINT) AS conv_a,
         CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
         CAST(SUM(conv) FILTER (arm = 1) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN ((conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b) > 0
            THEN CAST(floor(
              ((conv_a * 1.0 / n_a) - (conv_b * 1.0 / n_b))
              / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                     * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b)) * 1000000 + 0.5) AS DOUBLE)
            ELSE NULL END AS z_micro
FROM g"""


# ---------------------------------------------------------------------------
# docs_readability — LIX readability scores
# ---------------------------------------------------------------------------


def q_docs_readability(sf_dir: str):
    """LIX readability (Björnsson 1968, the corpus-filter readability family):
    LIX = words/sentences + 100·longwords/words, long = >6 chars, sentences =
    max(1, terminal-punctuation count). All counts from Arrow kernels —
    stateless, zero shuffles; the score derives in SQL expression order and
    micro-floors."""
    import pyarrow.compute as pc

    def score(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_words = pc.list_value_length(toks).to_numpy().astype(np.int64)
        lens = pc.binary_length(toks.flatten()).to_numpy()
        offs = np.concatenate([[0], np.cumsum(n_words)])
        long_flags = (lens > 6).astype(np.int64)
        n_long = np.add.reduceat(
            np.concatenate([long_flags, [0]]), offs[:-1]
        ) * (n_words > 0)
        n_sent = np.maximum(
            pc.count_substring_regex(text, pattern=r"[.!?]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            1,
        )
        lix = n_words / n_sent + 100.0 * n_long / n_words
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_sentences": pa.array(n_sent),
                "n_long": pa.array(n_long.astype(np.int64)),
                "lix_micro": pa.array(np.floor(lix * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


ORACLES49["docs_readability"] = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(coalesce(text, ''), '[.!?]')), 1)
              AS BIGINT) AS n_sentences,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              w -> strlen(w) > 6)) AS BIGINT) AS n_long
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_long,
       CAST(floor((n_words * 1.0 / n_sentences + 100.0 * n_long / n_words)
                  * 1000000 + 0.5) AS BIGINT) AS lix_micro
FROM s"""


QUERIES49 = {
    "events_ab_ztest": q_events_ab_ztest,
    "docs_readability": q_docs_readability,
}
