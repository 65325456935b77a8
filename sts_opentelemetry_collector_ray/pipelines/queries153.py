"""Driver-contract queries, wave 153 — conversation verbosity ratio
(assistant-to-user text mass per conversation, bucketed on the exponential
grid: does the model monologue?) and supplier load histogram (line items per
supplier in exponential buckets — the workload-skew census before assigning
supplier-keyed partitions). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES153: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_verbosity_ratio — assistant/user char-mass ratio per conversation
# ---------------------------------------------------------------------------


def q_conv_verbosity_ratio(sf_dir: str):
    """Per conversation with BOTH assistant and user text: the ratio of
    assistant to user character mass, quantized to milli units
    (floor(a·1000/u) — integer floor division, exact on both engines), then
    bucketed on the exponential grid (bucket 0 = ratio_milli 0, else
    bit_length) with conversation counts — the monologue detector.
    Conversations missing either side are absent on both engines.

    Scale shape: per-batch (conv, role) char-sum combiner rides ONE
    conv-bucket exchange; per-bucket pivot + integer ratio + frexp bucketize
    emit bounded histogram partials folded on the driver."""
    import pyarrow.compute as pc

    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("role",))
        df["chars"] = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        df = df[df["role"].isin(("assistant", "user"))]
        return (
            df.groupby(["conv", "role", "_b"], sort=False, as_index=False)["chars"]
            .sum()
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        s = g.groupby(["conv", "role"], sort=False)["chars"].sum().unstack()
        if "assistant" not in s.columns or "user" not in s.columns:
            return empty
        s = s.dropna(subset=["assistant", "user"])
        if s.empty:
            return empty
        a = s["assistant"].to_numpy(np.int64)
        u = s["user"].to_numpy(np.int64)
        ratio_milli = a * 1000 // u
        _, e = np.frexp(ratio_milli.astype(np.float64))
        bucket = np.where(ratio_milli == 0, 0, e).astype(np.int64)
        return (
            pd.DataFrame({"bucket": bucket, "n_convs": 1})
            .groupby("bucket", sort=False, as_index=False)["n_convs"]
            .sum()
            .astype(np.int64)
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ~40 buckets per exchange bucket
    )
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    out = part.groupby("bucket", sort=True)["n_convs"].sum().reset_index()
    total = float(out["n_convs"].sum())
    out["share_micro"] = np.floor(
        out["n_convs"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"bucket": np.int64, "n_convs": np.int64})


def _verbosity_ratio_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
s AS (
  SELECT conv_id,
         sum(CASE WHEN role = 'assistant' THEN length(text) END) AS a,
         sum(CASE WHEN role = 'user' THEN length(text) END) AS u
  FROM transcripts WHERE role IN ('assistant', 'user')
  GROUP BY 1
),
r AS (
  SELECT (a * 1000) // u AS ratio_milli FROM s
  WHERE a IS NOT NULL AND u IS NOT NULL
),
b AS (
  SELECT CASE WHEN ratio_milli = 0 THEN 0
              ELSE CAST(length(bin(ratio_milli)) AS BIGINT) END AS bucket
  FROM r
),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_convs FROM b GROUP BY 1)
SELECT bucket, n_convs,
       CAST(floor(CAST(n_convs AS DOUBLE)
                  / CAST((SELECT sum(n_convs) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM g"""
    )


ORACLES153["conv_verbosity_ratio"] = _verbosity_ratio_oracle()


# ---------------------------------------------------------------------------
# suppliers_load_histogram — line items per supplier, exponential buckets
# ---------------------------------------------------------------------------


def q_suppliers_load_histogram(sf_dir: str):
    """Per exponential bucket of line items per supplier (bucket =
    bit_length(count)): supplier count and total lines — the workload-skew
    census before keying a shuffle by supplier.

    Scale shape: per-batch (supplier, n) combiner, ONE supplier-bucket
    exchange completes counts, per-bucket frexp bucketize to bounded
    histogram partials folded on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "s": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "n": 1,
                }
            )
            .groupby("s", sort=False, as_index=False)["n"]
            .sum()
        )
        g["_b"] = (g["s"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("s", sort=False, as_index=False)["n"].sum()
        cnt = tot["n"].to_numpy(np.int64)
        _, e = np.frexp(cnt.astype(np.float64))
        return (
            pd.DataFrame(
                {"bucket": e.astype(np.int64), "n_suppliers": 1, "n_lines": cnt}
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
            "n_suppliers": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    return (
        part.groupby("bucket", sort=True)[["n_suppliers", "n_lines"]]
        .sum()
        .reset_index()
        .astype(np.int64)
    )


ORACLES153["suppliers_load_histogram"] = """
WITH per_s AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
),
b AS (SELECT CAST(length(bin(n)) AS BIGINT) AS bucket, n FROM per_s)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(n) AS BIGINT) AS n_lines
FROM b GROUP BY 1"""


QUERIES153 = {
    "conv_verbosity_ratio": q_conv_verbosity_ratio,
    "suppliers_load_histogram": q_suppliers_load_histogram,
}
