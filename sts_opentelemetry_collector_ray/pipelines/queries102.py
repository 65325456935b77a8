"""Driver-contract queries, wave 102 — vocabulary growth curve (Heaps'-law
deciles: distinct vocabulary accumulated across the doc-id axis — the
corpus-health diagnostic that catches duplicated or template-heavy crawls)
and recency-decayed engagement (per-user adstock score with a one-week
half-life as a PURE integer right-shift — the ranking signal retention
models consume). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES102: dict[str, str] = {}

_VG_BUCKETS = 32
_DE_BUCKETS = 32
_DE_SHIFT_CAP = 40  # cents < 2^40 ⇒ terms at deeper shifts are exactly 0
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_vocab_growth — Heaps'-law decile curve of distinct vocabulary
# ---------------------------------------------------------------------------


def q_docs_vocab_growth(sf_dir: str):
    """Vocabulary growth: at each of 10 doc-id-axis checkpoints
    b_d = lo + span·d//10, the count of distinct tokens whose FIRST
    occurrence (min doc_id) falls below the boundary — sublinear growth is
    healthy (Heaps' law), a flattening curve flags duplication.

    Scale shape: per-batch (token, min doc_id) combiner partials → ONE
    token-hash bucket exchange (the hapax >10k-group rule) → per-bucket
    exact min per token folds to a bounded 10-bin first-seen histogram —
    only 10 rows leave each bucket; the driver prefix-sums."""
    from ..functions.hashing import fnv1a32_arrow

    def bounds(t: pa.Table) -> pd.DataFrame:
        d = t["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    b = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(bounds, batch_format="pyarrow")
        .to_pandas()
    )
    lo, hi = int(b["lo"].min()), int(b["hi"].max())
    span = hi - lo + 1
    edges = np.array([lo + span * d // 10 for d in range(1, 11)], np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).fill_null(0).to_numpy()
        doc = np.repeat(t["doc_id"].to_numpy().astype(np.int64), n_per)
        flat = toks.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        keep = flat != ""
        g = (
            pd.DataFrame({"token": flat[keep], "fd": doc[keep]})
            .groupby("token", sort=False)["fd"]
            .min()
            .reset_index()
        )
        g["_b"] = (
            fnv1a32_arrow(pa.array(g["token"].astype(str))) % np.uint64(_VG_BUCKETS)
        ).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("token", sort=False)["fd"].min().to_numpy(np.int64)
        # first checkpoint whose boundary exceeds the first-seen doc id
        binix = np.searchsorted(edges, fd, side="right")
        cnt = np.bincount(binix, minlength=10)[:10]
        return pd.DataFrame(
            {"decile": np.arange(10, dtype=np.int64), "nv": cnt.astype(np.int64)}
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: 10 rows per bucket
    )
    nv = part.groupby("decile")["nv"].sum().reindex(range(10), fill_value=0)
    return pd.DataFrame(
        {
            "decile": np.arange(10, dtype=np.int64),
            "doc_boundary": edges,
            "vocab_cum": np.cumsum(nv.to_numpy(np.int64)),
        }
    )


ORACLES102["docs_vocab_growth"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
f AS (SELECT token, min(doc_id) AS fd FROM tok GROUP BY 1),
b AS (SELECT min(doc_id) AS lo, max(doc_id) - min(doc_id) + 1 AS span
      FROM documents),
g AS (
  SELECT CAST(d - 1 AS BIGINT) AS decile,
         CAST(lo + span * d // 10 AS BIGINT) AS doc_boundary
  FROM b, unnest(range(1, 11)) AS t(d)
)
SELECT g.decile, g.doc_boundary,
       CAST(count(f.token) AS BIGINT) AS vocab_cum
FROM g LEFT JOIN f ON f.fd < g.doc_boundary
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# events_decayed_engagement — integer adstock with a one-week half-life
# ---------------------------------------------------------------------------


def q_events_decayed_engagement(sf_dir: str):
    """Recency-decayed engagement: per user,
    score = Σ cents // 2^(weeks-ago) with weeks-ago anchored at the corpus
    max day — a one-week half-life adstock that is PURE integer on both
    sides (the right shift replaces λ^age float powers; terms past the
    2^{cap} cap are exactly zero anyway).

    Scale shape: a tiny max-day pre-pass; per-batch (user, Σ term, n)
    combiner partials enter ONE user-bucket exchange for the exact
    re-reduce — rows never shuffle.""".format(cap=_DE_SHIFT_CAP)

    def mx_part(t: pa.Table) -> pd.DataFrame:
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame({"mx": [int(d.max())]})

    mx = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(mx_part, batch_format="pyarrow")
        .to_pandas()["mx"]
        .max()
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        w = np.minimum((mx - d) // 7, _DE_SHIFT_CAP)
        term = cents >> w
        g = (
            pd.DataFrame({"u": u, "term": term})
            .groupby("u", sort=False)["term"]
            .agg(["sum", "size"])
            .reset_index()
        )
        g.columns = ["u", "s", "n"]
        g = g.astype(np.int64)
        g["_b"] = (g["u"] % _DE_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("u", sort=False)[["s", "n"]].sum().reset_index()
        return pd.DataFrame(
            {
                "user_id": m["u"].to_numpy(np.int64),
                "score_cents": m["s"].to_numpy(np.int64),
                "n_events": m["n"].to_numpy(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES102["events_decayed_engagement"] = f"""
WITH b AS (SELECT max(epoch_us(ts) // {_DAY_US}) AS mx FROM events),
e AS (
  SELECT user_id,
         CASE WHEN least((mx - epoch_us(ts) // {_DAY_US}) // 7,
                         {_DE_SHIFT_CAP}) >= {_DE_SHIFT_CAP}
              THEN CAST(floor(value * 100 + 0.5) AS HUGEINT)
                   // CAST(power(2, {_DE_SHIFT_CAP}) AS HUGEINT)
              ELSE CAST(floor(value * 100 + 0.5) AS HUGEINT)
                   // CAST(power(2, (mx - epoch_us(ts) // {_DAY_US}) // 7)
                           AS HUGEINT) END AS term
  FROM events, b
)
SELECT user_id, CAST(sum(term) AS BIGINT) AS score_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1"""


QUERIES102 = {
    "docs_vocab_growth": q_docs_vocab_growth,
    "events_decayed_engagement": q_events_decayed_engagement,
}
