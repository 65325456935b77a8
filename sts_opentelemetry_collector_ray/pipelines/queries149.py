"""Driver-contract queries, wave 149 — intra-conversation gap histogram
(wall-clock silence between consecutive turns, exponential second buckets:
the think-time profile behind session timeout tuning) and route selectivity
(per mapping rule: how many rows it matches and its share of the routed
stream — the router's own EXPLAIN). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES149: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_gap_histogram — think-time between consecutive turns, exp buckets
# ---------------------------------------------------------------------------


def q_conv_gap_histogram(sf_dir: str):
    """Per exponential bucket of the gap in WHOLE SECONDS between consecutive
    turns of the same conversation (gap_s = floor(Δts / 1e6); bucket 0 =
    sub-second, bucket k > 0 covers (2^(k-1), 2^k] seconds via the exact
    frexp bit-length): the number of gaps and their total seconds.

    Scale shape: turns co-locate per conversation through ONE conv-bucket
    exchange; per-bucket lexsort + shifted diffs + frexp bucketize emit
    bounded (~40-row) histogram partials folded on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ())
        df["ts_us"] = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "sum_seconds": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        ts = g["ts_us"].to_numpy(np.int64)
        same = conv[1:] == conv[:-1]
        gap_s = (ts[1:] - ts[:-1])[same] // 1_000_000
        if len(gap_s) == 0:
            return empty
        _, e = np.frexp(gap_s.astype(np.float64))
        bucket = np.where(gap_s == 0, 0, e).astype(np.int64)
        hist = (
            pd.DataFrame({"bucket": bucket, "n_gaps": 1, "sum_seconds": gap_s})
            .groupby("bucket", sort=False, as_index=False)
            .sum()
        )
        return hist.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ~40 buckets per exchange bucket
    )
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_gaps": pd.Series([], dtype=np.int64),
            "sum_seconds": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    return (
        part.groupby("bucket", sort=True)[["n_gaps", "sum_seconds"]]
        .sum()
        .reset_index()
        .astype(np.int64)
    )


def _gap_histogram_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
d AS (
  SELECT (epoch_us(ts)
          - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           // 1000000 AS gap_s
  FROM transcripts
),
b AS (
  SELECT CASE WHEN gap_s = 0 THEN 0
              ELSE CAST(length(bin(gap_s)) AS BIGINT) END AS bucket,
         gap_s
  FROM d WHERE gap_s IS NOT NULL
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_s) AS BIGINT) AS sum_seconds
FROM b GROUP BY 1"""
    )


ORACLES149["conv_gap_histogram"] = _gap_histogram_oracle()


# ---------------------------------------------------------------------------
# route_selectivity — per mapping rule: matched rows and stream share
# ---------------------------------------------------------------------------


def q_route_selectivity(sf_dir: str):
    """The router's EXPLAIN: per (sink, data_source, action) — rows the rule
    emitted, and the rule's share of the whole routed stream in micro units.
    Error rows (failed required expressions) are excluded on both engines,
    matching the exporter-facing stream.

    Scale shape: the oracled route_fanout pipeline followed by a per-batch
    bounded (sink, rule, action) combiner; driver fold; the only shuffle is
    the router's own."""
    import pyarrow.compute as pc

    from ..pipelines.flagship import routed_dataset
    from ..sources.transcripts import derive_transcripts_from_events

    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_null(t["error"]))
        g = (
            pd.DataFrame(
                {
                    "sink": np.asarray(t["sink"].to_numpy(zero_copy_only=False)),
                    "data_source": np.asarray(
                        t["data_source"].to_numpy(zero_copy_only=False)
                    ),
                    "action": np.asarray(t["action"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                }
            )
            .groupby(["sink", "data_source", "action"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "sink": pd.Series([], dtype=object),
            "data_source": pd.Series([], dtype=object),
            "action": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["sink", "data_source", "action"], sort=True)["n"]
        .sum()
        .reset_index(name="n_rows")
    )
    total = float(out["n_rows"].sum())
    out["share_micro"] = np.floor(
        out["n_rows"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"n_rows": np.int64})


def _selectivity_oracle() -> str:
    from .queries import _ROUTES_SQL

    return (
        _ROUTES_SQL
        + """,
ok AS (
  -- the bad-required rule (NULL external_id) emits only error rows: excluded
  SELECT sink, data_source, action FROM routes
  WHERE data_source <> 'urn:mapping:bad-required'
),
g AS (
  SELECT sink, data_source, action, CAST(count(*) AS BIGINT) AS n_rows
  FROM ok GROUP BY 1, 2, 3
)
SELECT sink, data_source, action, n_rows,
       CAST(floor(CAST(n_rows AS DOUBLE)
                  / CAST((SELECT sum(n_rows) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM g"""
    )


ORACLES149["route_selectivity"] = _selectivity_oracle()


QUERIES149 = {
    "conv_gap_histogram": q_conv_gap_histogram,
    "route_selectivity": q_route_selectivity,
}
