"""Driver-contract queries, wave 181 — conversation duration histogram
(first→last turn wall-clock in exponential minute buckets, with turn mass)
and the tax-rate profile (line counts and revenue per tax milli value).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES181: dict[str, str] = {}

_MIN_US = 60_000_000


# ---------------------------------------------------------------------------
# conv_duration_histogram — conversation wall-clock, exp minute buckets
# ---------------------------------------------------------------------------


def q_conv_duration_histogram(sf_dir: str):
    """Per exponential bucket of conversation duration in WHOLE MINUTES
    (first→last turn ts; sub-minute conversations land in bucket 0, else
    bit_length(minutes)): conversation count and total turns.

    Scale shape: per-batch (conv, min_ts, max_ts, n) combiner rides ONE
    conv-bucket exchange; per-bucket frexp bucketize emits bounded histogram
    partials folded on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        ts = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        )
        df = pd.DataFrame({"conv": conv, "lo": ts, "hi": ts, "n": 1})
        g = df.groupby("conv", sort=False, as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
        )
        g["_b"] = (
            fnv1a64_array(g["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return g.astype({"lo": np.int64, "hi": np.int64, "n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per_conv = g.groupby("conv", sort=False, as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
        )
        minutes = (per_conv["hi"] - per_conv["lo"]).to_numpy(np.int64) // _MIN_US
        _, e = np.frexp(minutes.astype(np.float64))
        bucket = np.where(minutes == 0, 0, e).astype(np.int64)
        return (
            pd.DataFrame(
                {"bucket": bucket, "n_convs": 1, "n_turns": per_conv["n"]}
            )
            .groupby("bucket", sort=False, as_index=False)
            .sum()
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
            "bucket": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
            "n_turns": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    return (
        part.groupby("bucket", sort=True)[["n_convs", "n_turns"]]
        .sum()
        .reset_index()
        .astype(np.int64)
    )


def _duration_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""",
c AS (
  SELECT conv_id,
         (max(epoch_us(ts)) - min(epoch_us(ts))) // {_MIN_US} AS minutes,
         CAST(count(*) AS BIGINT) AS n
  FROM transcripts GROUP BY 1
),
b AS (
  SELECT CASE WHEN minutes = 0 THEN 0
              ELSE CAST(length(bin(minutes)) AS BIGINT) END AS bucket,
         n
  FROM c
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n) AS BIGINT) AS n_turns
FROM b GROUP BY 1"""
    )


ORACLES181["conv_duration_histogram"] = _duration_oracle()


# ---------------------------------------------------------------------------
# lineitem_tax_profile — line counts and revenue per tax milli value
# ---------------------------------------------------------------------------


def q_lineitem_tax_profile(sf_dir: str):
    """Per tax value in milli units: line count, exact revenue cents, and the
    tax band's revenue share in micro units.

    Scale shape: per-batch bounded (tax, n, cents) combiner; driver fold."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_tax", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        milli = np.floor(
            t["l_tax"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"tax_milli": milli, "n": 1, "cents": cents})
            .groupby("tax_milli", sort=False, as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "tax_milli": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("tax_milli", sort=True)
        .agg(n_lines=("n", "sum"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    total = float(out["sum_cents"].sum())
    out["share_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES181["lineitem_tax_profile"] = """
WITH g AS (
  SELECT CAST(floor(l_tax * 1000.0 + 0.5) AS BIGINT) AS tax_milli,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents
  FROM lineitem GROUP BY 1
)
SELECT tax_milli, n_lines, sum_cents,
       CAST(floor(CAST(sum_cents AS DOUBLE)
                  / CAST((SELECT sum(sum_cents) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM g"""


QUERIES181 = {
    "conv_duration_histogram": q_conv_duration_histogram,
    "lineitem_tax_profile": q_lineitem_tax_profile,
}
