"""Driver-contract queries, wave 141 — tool adoption depth (at which turn
index a conversation FIRST calls each tool: the onboarding/latency-of-use
census over transcripts) and per-source exact duplication (which corpus
source is most boilerplate-ridden — the source-level companion to
conv_turn_dup_rate). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES141: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_tool_first_use — first turn index each conversation calls each tool
# ---------------------------------------------------------------------------


def q_conv_tool_first_use(sf_dir: str):
    """Per (tool, first-use turn index): how many conversations first call
    that tool at that depth (tool turns only, tool <> ''). The adoption-depth
    histogram a transcript-curation pipeline uses to spot tools that only
    ever appear deep in long conversations.

    Scale shape: turns co-locate per conversation through ONE conv-bucket
    exchange; per-bucket vectorized (conv, tool) min-turn via ONE lexsort +
    drop_duplicates, then bounded (tool, turn, n) histogram partials fold on
    the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("role", "tool"))
        df = df[(df["role"] == "tool") & (df["tool"] != "")]
        return df[["conv", "turn", "tool", "_b"]]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        first = (
            g.sort_values(["conv", "tool", "turn"], kind="mergesort")
            .drop_duplicates(["conv", "tool"])
        )
        out = (
            first.groupby(["tool", "turn"], sort=False)
            .size()
            .reset_index(name="n_convs")
        )
        return out.rename(columns={"turn": "first_turn"}).astype(
            {"first_turn": np.int64, "n_convs": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |tools| × depth histogram rows per bucket
    )
    empty = pd.DataFrame(
        {
            "tool": pd.Series([], dtype=object),
            "first_turn": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "tool" not in part.columns:
        return empty
    return (
        part.groupby(["tool", "first_turn"], sort=True)["n_convs"]
        .sum()
        .reset_index()
        .astype({"first_turn": np.int64, "n_convs": np.int64})
    )


def _first_use_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
f AS (
  SELECT conv_id, tool, min(turn_idx) AS first_turn
  FROM transcripts WHERE role = 'tool' AND tool <> ''
  GROUP BY 1, 2
)
SELECT tool, CAST(first_turn AS BIGINT) AS first_turn,
       CAST(count(*) AS BIGINT) AS n_convs
FROM f GROUP BY 1, 2"""
    )


ORACLES141["conv_tool_first_use"] = _first_use_oracle()


# ---------------------------------------------------------------------------
# docs_dup_ratio_by_source — exact duplicate share per corpus source
# ---------------------------------------------------------------------------


def q_docs_dup_ratio_by_source(sf_dir: str):
    """Per source: total documents, exactly-distinct texts, and the duplicate
    share in micro units (floor-half-up; ONE double division over exact
    int64 counts) — which ingest source needs dedup the most.

    Scale shape: per-batch (source, text) -> count combiner, ONE text-hash
    bucket exchange (a distinct (source, text) pair lands wholly in one
    bucket — the conv_turn_dup_rate precedent), per-bucket re-reduce to
    ≤ |sources| partials folded on the driver; document text crosses the
    exchange once and never reaches the driver."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "source": np.asarray(t["source"].to_numpy(zero_copy_only=False)),
                    "text": np.asarray(t["text"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                }
            )
            .groupby(["source", "text"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        h = fnv1a32_arrow(pa.array(g["text"], type=pa.string()))
        g["_b"] = (h % 64).astype(np.int64)
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["source", "text"], sort=False)["n"].sum().reset_index()
        out = (
            gg.groupby("source", sort=False)
            .agg(n_docs=("n", "sum"), n_distinct=("text", "count"))
            .reset_index()
        )
        return out.astype({"n_docs": np.int64, "n_distinct": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |sources| rows per bucket
    )
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "n_distinct": pd.Series([], dtype=np.int64),
            "dup_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "source" not in part.columns:
        return empty
    out = (
        part.groupby("source", sort=True)
        .agg(n_docs=("n_docs", "sum"), n_distinct=("n_distinct", "sum"))
        .reset_index()
    )
    nd = out["n_docs"].to_numpy(np.int64)
    nu = out["n_distinct"].to_numpy(np.int64)
    out["dup_micro"] = np.floor(
        (nd - nu).astype(np.float64) / nd.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"n_docs": np.int64, "n_distinct": np.int64})


ORACLES141["docs_dup_ratio_by_source"] = """
WITH g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
  FROM documents GROUP BY 1
)
SELECT source, n_docs, n_distinct,
       CAST(floor(CAST(n_docs - n_distinct AS DOUBLE)
                  / CAST(n_docs AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS dup_micro
FROM g"""


QUERIES141 = {
    "conv_tool_first_use": q_conv_tool_first_use,
    "docs_dup_ratio_by_source": q_docs_dup_ratio_by_source,
}
