"""Driver-contract queries, wave 160 — weekend lift per event type (weekend
volume share against the uniform 2/7 baseline) and severity mix by
conversation depth (do errors cluster late in conversations? the parsed
severity column over depth buckets). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES160: dict[str, str] = {}

_DAY_US = 86_400_000_000
_DEPTH_BUCKET = 10


# ---------------------------------------------------------------------------
# events_weekend_lift — weekend share vs the uniform 2/7 baseline
# ---------------------------------------------------------------------------


def q_events_weekend_lift(sf_dir: str):
    """Per event type: total events, weekend events (epoch-day mod 7 in
    {2, 3} — 1970-01-01 was a Thursday, so Saturday ≡ 2 and Sunday ≡ 3),
    the weekend share in micro units, and the lift against 2/7 in micro
    units (share·7/2, integer products before ONE double division).

    Scale shape: per-batch (type, weekend, n) combiner over the bounded
    grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        wk = np.isin(day % 7, (2, 3)).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                    "wk": wk,
                }
            )
            .groupby("event_type", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "wk": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "n_weekend": pd.Series([], dtype=np.int64),
            "weekend_micro": pd.Series([], dtype=np.int64),
            "lift_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("event_type", sort=True)
        .agg(n_events=("n", "sum"), n_weekend=("wk", "sum"))
        .reset_index()
    )
    n = out["n_events"].to_numpy(np.int64)
    w = out["n_weekend"].to_numpy(np.int64)
    out["weekend_micro"] = np.floor(
        w.astype(np.float64) / n.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["lift_micro"] = np.floor(
        (w * 7).astype(np.float64) / (n * 2).astype(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_events": np.int64, "n_weekend": np.int64})


ORACLES160["events_weekend_lift"] = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) FILTER ((epoch_us(ts) // {_DAY_US}) % 7 IN (2, 3))
              AS BIGINT) AS n_weekend
  FROM events GROUP BY 1
)
SELECT event_type, n_events, n_weekend,
       CAST(floor(CAST(n_weekend AS DOUBLE) / CAST(n_events AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS weekend_micro,
       CAST(floor(CAST(n_weekend * 7 AS DOUBLE) / CAST(n_events * 2 AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
FROM g"""


# ---------------------------------------------------------------------------
# conv_severity_by_depth — parsed severity mix over depth buckets
# ---------------------------------------------------------------------------


def q_conv_severity_by_depth(sf_dir: str):
    """Per (depth bucket = turn_idx // 10, parsed severity): turn count and
    the severity's share WITHIN the bucket in micro units — does ERROR mass
    migrate to late turns?

    Scale shape: the oracled parse stage + per-batch bounded (bucket,
    severity) combiner; driver fold; no shuffle."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        depth = (
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            // _DEPTH_BUCKET
        )
        g = (
            pd.DataFrame(
                {
                    "depth_bucket": depth,
                    "severity": np.asarray(
                        t["severity"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                }
            )
            .groupby(["depth_bucket", "severity"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"depth_bucket": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "depth_bucket": pd.Series([], dtype=np.int64),
            "severity": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
            "in_bucket_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["depth_bucket", "severity"], sort=True)["n"]
        .sum()
        .reset_index(name="n_turns")
    )
    btot = out.groupby("depth_bucket")["n_turns"].transform("sum")
    out["in_bucket_micro"] = np.floor(
        out["n_turns"].to_numpy(np.float64)
        / btot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"depth_bucket": np.int64, "n_turns": np.int64})


def _severity_by_depth_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + f""",
g AS (
  SELECT CAST(turn_idx // {_DEPTH_BUCKET} AS BIGINT) AS depth_bucket,
         severity,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM parsed GROUP BY 1, 2
),
bt AS (
  SELECT depth_bucket, CAST(sum(n_turns) AS BIGINT) AS tot
  FROM g GROUP BY 1
)
SELECT g.depth_bucket, g.severity, g.n_turns,
       CAST(floor(CAST(g.n_turns AS DOUBLE) / CAST(bt.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_bucket_micro
FROM g JOIN bt USING (depth_bucket)"""
    )


ORACLES160["conv_severity_by_depth"] = _severity_by_depth_oracle()


QUERIES160 = {
    "events_weekend_lift": q_events_weekend_lift,
    "conv_severity_by_depth": q_conv_severity_by_depth,
}
