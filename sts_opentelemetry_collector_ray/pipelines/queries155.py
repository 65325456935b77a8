"""Driver-contract queries, wave 155 — cross-source duplicate census (texts
ingested by more than one source: the crawl-overlap signal that inflates
corpus size without adding information) and Gopher quality by source (the
per-rule pass rates aggregated per ingest source — which feed is dirtiest).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES155: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_cross_source_dup — texts appearing under k distinct sources
# ---------------------------------------------------------------------------


def q_docs_cross_source_dup(sf_dir: str):
    """Histogram over k = number of DISTINCT sources a text appears under:
    how many distinct texts have that fan-out and how many document rows
    they account for. k ≥ 2 rows are the cross-source duplicates.

    Scale shape: per-batch distinct (source, text) + (text, rows) count
    combiner, ONE text-hash bucket exchange (a text's sources and counts
    complete in one bucket), per-bucket fan-out histogram partials folded on
    the driver; text crosses the exchange once."""
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
        per_text = g.groupby("text", sort=False).agg(
            k=("source", "nunique"), rows=("n", "sum")
        )
        hist = (
            per_text.groupby("k", sort=False)
            .agg(n_texts=("rows", "count"), n_rows=("rows", "sum"))
            .reset_index()
        )
        return hist.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |sources| histogram rows per bucket
    )
    empty = pd.DataFrame(
        {
            "n_sources": pd.Series([], dtype=np.int64),
            "n_texts": pd.Series([], dtype=np.int64),
            "n_rows": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "k" not in part.columns:
        return empty
    return (
        part.groupby("k", sort=True)[["n_texts", "n_rows"]]
        .sum()
        .reset_index()
        .rename(columns={"k": "n_sources"})
        .astype(np.int64)
    )


ORACLES155["docs_cross_source_dup"] = """
WITH per_text AS (
  SELECT text, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(*) AS BIGINT) AS rows
  FROM documents GROUP BY 1
)
SELECT n_sources,
       CAST(count(*) AS BIGINT) AS n_texts,
       CAST(sum(rows) AS BIGINT) AS n_rows
FROM per_text GROUP BY 1"""


# ---------------------------------------------------------------------------
# docs_gopher_by_source — Gopher rule pass rates per ingest source
# ---------------------------------------------------------------------------


def q_docs_gopher_by_source(sf_dir: str):
    """Per source: document count, per-rule pass counts (word-count bounds,
    mean word length, symbol ratio, stop-word evidence) and the overall keep
    rate in micro units — the oracled Gopher kernels aggregated along the
    ingest dimension.

    Scale shape: the vectorized gopher batch kernel plus a bounded
    per-source flag combiner; driver fold; no shuffle."""
    from ..stages.text_analysis import gopher_quality_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        flags = gopher_quality_batch(t.select(["doc_id", "text"]))
        df = pd.DataFrame(
            {
                "source": np.asarray(t["source"].to_numpy(zero_copy_only=False)),
                "n": 1,
                "ok_word_count": flags["ok_word_count"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "ok_mean_word_len": flags["ok_mean_word_len"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "ok_symbol_ratio": flags["ok_symbol_ratio"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "ok_stopwords": flags["ok_stopwords"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "keep": flags["keep"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return df.groupby("source", sort=False, as_index=False).sum()

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = [
        "n_docs",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_stopwords",
        "n_keep",
        "keep_micro",
    ]
    empty = pd.DataFrame(
        {"source": pd.Series([], dtype=object)}
        | {c: pd.Series([], dtype=np.int64) for c in cols}
    )
    if part.empty:
        return empty
    out = (
        part.groupby("source", sort=True)
        .agg(
            n_docs=("n", "sum"),
            ok_word_count=("ok_word_count", "sum"),
            ok_mean_word_len=("ok_mean_word_len", "sum"),
            ok_symbol_ratio=("ok_symbol_ratio", "sum"),
            ok_stopwords=("ok_stopwords", "sum"),
            n_keep=("keep", "sum"),
        )
        .reset_index()
    )
    out["keep_micro"] = np.floor(
        out["n_keep"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})


def _gopher_by_source_oracle() -> str:
    from .queries3 import ORACLES3

    return f"""
WITH flags AS ({ORACLES3["docs_gopher"]}),
j AS (
  SELECT d.source, f.ok_word_count, f.ok_mean_word_len, f.ok_symbol_ratio,
         f.ok_stopwords, f.keep
  FROM flags f JOIN documents d USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(ok_word_count AS BIGINT)) AS BIGINT) AS ok_word_count,
       CAST(sum(CAST(ok_mean_word_len AS BIGINT)) AS BIGINT) AS ok_mean_word_len,
       CAST(sum(CAST(ok_symbol_ratio AS BIGINT)) AS BIGINT) AS ok_symbol_ratio,
       CAST(sum(CAST(ok_stopwords AS BIGINT)) AS BIGINT) AS ok_stopwords,
       CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS n_keep,
       CAST(floor(CAST(sum(CAST(keep AS BIGINT)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS keep_micro
FROM j GROUP BY 1"""


ORACLES155["docs_gopher_by_source"] = _gopher_by_source_oracle()


QUERIES155 = {
    "docs_cross_source_dup": q_docs_cross_source_dup,
    "docs_gopher_by_source": q_docs_gopher_by_source,
}
