"""Driver-contract queries, wave 127 — Benford first-digit profile of event
values (an injected/fabricated-amounts screen: natural multiplicative data
follows log10(1+1/d), uniform synthetics don't) and the tool→tool transition
matrix over conversations (the Markov bigram profile of agent tool use —
which tool follows which, with per-row transition shares). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES127: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_benford — first-significant-digit profile per event type
# ---------------------------------------------------------------------------


def q_events_benford(sf_dir: str):
    """Benford screen: values convert to exact cents (the price-points
    convention), positive cents contribute their first decimal digit; per
    (event_type, digit) the observed share and the Benford expectation
    log10(1+1/d) are emitted in micro units (floor-half-up; the share is the
    one double division, the expectation is one libm log10 — identical IEEE
    doubles on both sides, and the ×1e6 floor sits ≥1e-4 from every
    boundary so a last-ulp libm difference cannot flip it).

    Scale shape: per-batch (event_type, digit, n) combiner partials — at
    most 9·|types| rows per block — fold on the driver; no shuffle."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = cents > 0
        if not pos.any():
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "digit": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        # first significant digit via the decimal string head — exact for
        # int64 on both engines (no log10-of-value precision cliff at 10^k)
        first = pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents[pos]), pa.string()), 0, 1
        )
        digit = pc.cast(first, pa.int64()).to_numpy()
        g = (
            pd.DataFrame({"event_type": et[pos], "digit": digit, "n": 1})
            .groupby(["event_type", "digit"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"digit": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ 9·|types| rows per block
    )
    if part.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "digit": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "share_micro": pd.Series([], dtype=np.int64),
                "benford_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby(["event_type", "digit"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    tot = out.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    out["share_micro"] = np.floor(
        out["n"].to_numpy(np.float64) / tot.astype(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    d = out["digit"].to_numpy(np.float64)
    out["benford_micro"] = np.floor(
        np.log10(1.0 + 1.0 / d) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    for c in ("digit", "n"):
        out[c] = out[c].astype(np.int64)
    return out[["event_type", "digit", "n", "share_micro", "benford_micro"]]


ORACLES127["events_benford"] = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT event_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
),
g AS (
  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY 1, 2
)
SELECT event_type, digit, n,
       CAST(floor(CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS benford_micro
FROM g"""


# ---------------------------------------------------------------------------
# conv_tool_bigrams — tool→tool transition matrix within conversations
# ---------------------------------------------------------------------------


def q_conv_tool_bigrams(sf_dir: str):
    """Tool-use Markov bigrams: per conversation, the ordered subsequence of
    tool-call turns (role='tool', non-empty tool) yields adjacent
    (prev_tool → next_tool) transitions; per ordered pair the count and the
    row-conditional transition share P(next | prev) in micro units
    (floor-half-up, one double division on both sides).

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange; per-bucket lexsort + shifted-array pairing emits
    bounded (prev, next, n) partials — ≤ |tools|² rows per bucket — that
    fold on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from .queries125 import _conv_bucket_partial

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role", "tool"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        is_call = (g["role"].to_numpy(object) == "tool") & (
            g["tool"].to_numpy(object) != ""
        )
        g = g[is_call]
        conv = g["conv"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "prev_tool": pd.Series([], dtype=object),
                    "next_tool": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        same = conv[1:] == conv[:-1]
        h = (
            pd.DataFrame(
                {"prev_tool": tool[:-1][same], "next_tool": tool[1:][same], "n": 1}
            )
            .groupby(["prev_tool", "next_tool"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return h.astype({"n": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |tools|² rows per bucket
    )
    if part.empty or "prev_tool" not in part.columns:
        return pd.DataFrame(
            {
                "prev_tool": pd.Series([], dtype=object),
                "next_tool": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "share_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby(["prev_tool", "next_tool"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    tot = out.groupby("prev_tool")["n"].transform("sum").to_numpy(np.int64)
    out["share_micro"] = np.floor(
        out["n"].to_numpy(np.float64) / tot.astype(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out[["prev_tool", "next_tool", "n", "share_micro"]]


def _tool_bigrams_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, calls AS (
  SELECT conv_id, turn_idx, tool FROM parsed
  WHERE role = 'tool' AND tool <> ''
),
pairs AS (
  SELECT tool AS prev_tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM calls
),
cnt AS (
  SELECT prev_tool, next_tool, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE next_tool IS NOT NULL GROUP BY 1, 2
)
SELECT prev_tool, next_tool, n,
       CAST(floor(CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY prev_tool) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM cnt"""
    )


ORACLES127["conv_tool_bigrams"] = _tool_bigrams_oracle()


QUERIES127 = {
    "events_benford": q_events_benford,
    "conv_tool_bigrams": q_conv_tool_bigrams,
}
