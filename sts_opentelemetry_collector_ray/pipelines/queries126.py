"""Driver-contract queries, wave 126 — severity dwell time (wall-clock
attribution: how long conversations SIT in each severity state before the
next turn arrives) and per-source Simpson lexical diversity (the
repeated-token collision probability — a corpus-health complement to the
Zipf slope and hapax ratio). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES126: dict[str, str] = {}

_SD_BUCKETS = 32
_SIMPSON_BUCKETS = 64


# ---------------------------------------------------------------------------
# conv_severity_dwell — seconds spent in each severity state
# ---------------------------------------------------------------------------


def q_conv_severity_dwell(sf_dir: str):
    """State dwell time: every turn with a NEXT turn in its conversation
    contributes the whole-second gap to that next turn, attributed to the
    CURRENT turn's parsed severity — the per-state latency mass of the
    transcript stream. Totals are exact int64; the mean is one double
    division (floor-half-up micro) on both sides.

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange; per-bucket lexsort + shifted diffs emit bounded
    (severity, Σsec, n) partials that fold on the driver."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "severity": np.asarray(
                    t["severity"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        df["_b"] = (
            fnv1a64_array(conv.astype(object)) % np.uint64(_SD_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        ts = g["ts"].to_numpy(np.int64)
        sev = g["severity"].to_numpy(object)
        has_next = np.r_[conv[1:] == conv[:-1], False]
        gap = np.zeros(len(g), np.int64)
        gap[:-1] = (ts[1:] - ts[:-1]) // 1_000_000
        h = (
            pd.DataFrame({"severity": sev[has_next], "sec": gap[has_next]})
            .groupby("severity", sort=False)
            .agg(total_sec=("sec", "sum"), n_intervals=("sec", "size"))
            .reset_index()
        )
        return h.astype({"total_sec": np.int64, "n_intervals": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |severities| rows per bucket
    )
    if part.empty or "severity" not in part.columns:
        return pd.DataFrame(
            {
                "severity": pd.Series([], dtype=object),
                "total_sec": pd.Series([], dtype=np.int64),
                "n_intervals": pd.Series([], dtype=np.int64),
                "mean_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby("severity", sort=True)[["total_sec", "n_intervals"]]
        .sum()
        .reset_index()
    )
    out["mean_micro"] = np.floor(
        out["total_sec"].to_numpy(np.float64)
        / out["n_intervals"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    for c in ("total_sec", "n_intervals"):
        out[c] = out[c].astype(np.int64)
    return out[["severity", "total_sec", "n_intervals", "mean_micro"]]


def _severity_dwell_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, g AS (
  SELECT severity,
         (lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
          - epoch_us(ts)) // 1000000 AS sec
  FROM parsed
),
f AS (SELECT severity, CAST(sec AS BIGINT) AS sec FROM g WHERE sec IS NOT NULL),
a AS (
  SELECT severity, CAST(sum(sec) AS BIGINT) AS total_sec,
         CAST(count(*) AS BIGINT) AS n_intervals
  FROM f GROUP BY 1
)
SELECT severity, total_sec, n_intervals,
       CAST(floor(CAST(total_sec AS DOUBLE) / CAST(n_intervals AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS mean_micro
FROM a"""
    )


ORACLES126["conv_severity_dwell"] = _severity_dwell_oracle()


# ---------------------------------------------------------------------------
# docs_simpson_diversity — per-source repeated-token collision probability
# ---------------------------------------------------------------------------


def q_docs_simpson_diversity(sf_dir: str):
    """Simpson's λ per source: the probability two tokens drawn without
    replacement from a source's corpus are the SAME word — λ = Σc(c−1) /
    (N(N−1)) over per-word counts c. Everything is exact int64 until the one
    final double division (floor-half-up micro).

    Scale shape: per-batch (source, word, n) combiner partials → ONE
    word-hash bucket exchange (vocabulary is unbounded: the >10k-group rule)
    → per-bucket exact re-reduce emits |sources| integer partials (Σn,
    Σn(n−1), distinct) per bucket; the driver folds bounded rows."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_array

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        values = flat.flatten()
        counts = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False))
        words = np.asarray(values.to_numpy(zero_copy_only=False))
        keep = words != ""
        df = pd.DataFrame(
            {"source": np.repeat(src, counts)[keep], "word": words[keep]}
        )
        h = (
            df.groupby(["source", "word"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        h["n"] = h["n"].astype(np.int64)
        h["_b"] = (
            fnv1a64_array(h["word"].to_numpy(object))
            % np.uint64(_SIMPSON_BUCKETS)
        ).astype(np.int64)
        return h

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        wc = g.groupby(["source", "word"], sort=False)["n"].sum()
        n = wc.to_numpy(np.int64)
        src = wc.index.get_level_values(0).to_numpy(object)
        out = (
            pd.DataFrame({"source": src, "n": n, "s2": n * (n - 1)})
            .groupby("source", sort=False)
            .agg(
                n_tokens=("n", "sum"),
                s2=("s2", "sum"),
                n_distinct=("n", "size"),
            )
            .reset_index()
        )
        return out.astype(
            {"n_tokens": np.int64, "s2": np.int64, "n_distinct": np.int64}
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |sources| rows per bucket
    )
    if part.empty or "source" not in part.columns:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_tokens": pd.Series([], dtype=np.int64),
                "n_distinct": pd.Series([], dtype=np.int64),
                "simpson_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby("source", sort=True)[["n_tokens", "s2", "n_distinct"]]
        .sum()
        .reset_index()
    )
    out = out[out["n_tokens"] >= 2].reset_index(drop=True)
    nn = out["n_tokens"].to_numpy(np.int64)
    out["simpson_micro"] = np.floor(
        out["s2"].to_numpy(np.float64)
        / (nn * (nn - 1)).astype(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    for c in ("n_tokens", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out[["source", "n_tokens", "n_distinct", "simpson_micro"]]


ORACLES126["docs_simpson_diversity"] = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
agg AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(sum(n * (n - 1)) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM wc GROUP BY 1
)
SELECT source, n_tokens, n_distinct,
       CAST(floor(CAST(s2 AS DOUBLE) / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS simpson_micro
FROM agg WHERE n_tokens >= 2"""


QUERIES126 = {
    "conv_severity_dwell": q_conv_severity_dwell,
    "docs_simpson_diversity": q_docs_simpson_diversity,
}
