"""Driver-contract queries, wave 175 — conversation resolution rate (did the
LAST tool call succeed? the support-desk resolution proxy) and hour-of-day
entropy per event type (how spread a type's traffic is over the 24-hour
clock — uniform ≈ ln 24, spiky → 0; the fixed 24-slot alphabet lets the SQL
replay enumerate every entropy term in the same order as the Python loop,
the events_markov_entropy precedent). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES175: dict[str, str] = {}

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# conv_resolution_rate — last tool call per conversation succeeded?
# ---------------------------------------------------------------------------


def q_conv_resolution_rate(sf_dir: str):
    """Over conversations WITH at least one tool-role turn: how many end
    their tool track on a non-ERROR severity (resolved) vs ERROR
    (unresolved), and the resolution share in micro units — one row.

    Scale shape: parsed tool turns ride ONE conv-bucket exchange; per-bucket
    lexsort + boundary scan pick each conversation's LAST tool turn; two
    scalars per bucket fold on the driver."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        role = np.asarray(t["role"].to_numpy(zero_copy_only=False))
        keep = role == "tool"
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))[keep]
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )[keep],
                "err": (
                    np.asarray(t["severity"].to_numpy(zero_copy_only=False))[keep]
                    == "ERROR"
                ).astype(np.int64),
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_convs": pd.Series([], dtype=np.int64),
                "n_resolved": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        last = np.r_[conv[1:] != conv[:-1], True]
        err_last = g["err"].to_numpy(np.int64)[last]
        return pd.DataFrame(
            {
                "n_convs": [np.int64(last.sum())],
                "n_resolved": [np.int64((err_last == 0).sum())],
            }
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "n_convs": pd.Series([], dtype=np.int64),
            "n_resolved": pd.Series([], dtype=np.int64),
            "resolution_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n_convs" not in part.columns:
        return empty
    n = int(part["n_convs"].sum())
    if n == 0:
        return empty
    r = int(part["n_resolved"].sum())
    return pd.DataFrame(
        {
            "n_convs": [np.int64(n)],
            "n_resolved": [np.int64(r)],
            "resolution_micro": [
                np.int64(np.floor(r / float(n) * 1_000_000.0 + 0.5))
            ],
        }
    )


def _resolution_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + """,
tools AS (
  SELECT conv_id, turn_idx, severity FROM parsed WHERE role = 'tool'
),
last AS (
  SELECT conv_id, max(turn_idx) AS t FROM tools GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_convs,
         CAST(count(*) FILTER (tools.severity <> 'ERROR') AS BIGINT)
           AS n_resolved
  FROM tools JOIN last
    ON tools.conv_id = last.conv_id AND tools.turn_idx = last.t
)
SELECT n_convs, n_resolved,
       CAST(floor(CAST(n_resolved AS DOUBLE) / CAST(n_convs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS resolution_micro
FROM s WHERE n_convs > 0"""
    )


ORACLES175["conv_resolution_rate"] = _resolution_oracle()


# ---------------------------------------------------------------------------
# events_hour_entropy — clock-spread entropy per event type
# ---------------------------------------------------------------------------


def q_events_hour_entropy(sf_dir: str):
    """Per event type: total events and the Shannon entropy (nats, rounded
    half-up at 1e-6) of the hour-of-day distribution — the 24 terms
    accumulate in FIXED hour order so the SQL replay is bit-equal (the
    markov-entropy precedent).

    Scale shape: per-batch (type, hour-of-day, n) combiner over the bounded
    24×|types| grid; driver fold."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        hod = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _HOUR_US
        ) % 24
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "hod": hod,
                    "n": 1,
                }
            )
            .groupby(["event_type", "hod"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"hod": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "entropy": pd.Series([], dtype=np.float64),
        }
    )
    if part.empty:
        return empty
    c = (
        part.groupby(["event_type", "hod"])["n"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=list(range(24)), fill_value=0)
        .sort_index()
    )
    tot = c.to_numpy().sum(axis=1).astype(np.float64)
    h = np.zeros(len(c), dtype=np.float64)
    for hod in range(24):  # fixed order → same float accumulation as SQL
        n = c[hod].to_numpy().astype(np.float64)
        p = n / tot
        term = np.where(n > 0, p * np.log(np.where(n > 0, p, 1.0)), 0.0)
        h = h - term
    return pd.DataFrame(
        {
            "event_type": c.index.to_numpy(object),
            "n_events": c.to_numpy().sum(axis=1).astype(np.int64),
            "entropy": np.floor(h * 1_000_000.0 + 0.5) / 1_000_000.0,
        }
    )


def _hod_term_sql(hod: int) -> str:
    n = f"count(*) FILTER (WHERE hod = {hod})"
    return (
        f"CASE WHEN {n} > 0 THEN (CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE))"
        f" * ln(CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE)) ELSE 0.0 END"
    )


ORACLES175["events_hour_entropy"] = (
    f"""
WITH e AS (
  SELECT event_type, (epoch_us(ts) // {_HOUR_US}) % 24 AS hod FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       floor((0.0"""
    + "".join(f" - ({_hod_term_sql(h)})" for h in range(24))
    + """) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM e GROUP BY event_type"""
)


QUERIES175 = {
    "conv_resolution_rate": q_conv_resolution_rate,
    "events_hour_entropy": q_events_hour_entropy,
}
