"""Driver-contract queries, wave 122 — day-part window selection (the
contiguous 8-hour clock window holding the largest value share per event
type, circular over midnight: the staffing/campaign-scheduling readout) and
conversation escalation rate (conversations whose severity ranks never
decrease and end in ERROR — the burning-session share an on-call dashboard
tracks). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES122: dict[str, str] = {}

_DP_WIN = 8  # window width in hours
_HOUR_US = 3_600_000_000
_ESC_BUCKETS = 32
# severity ranks for the escalation check (parse severities)
_SEV_RANK = {"DEBUG": 0, "INFO": 1, "UNKNOWN": 1, "WARN": 2, "ERROR": 3}


# ---------------------------------------------------------------------------
# events_daypart_window — best circular 8-hour value window per type
# ---------------------------------------------------------------------------


def q_events_daypart_window(sf_dir: str):
    """Day-parting: per event type, the start hour of the {W}-hour circular
    clock window with the largest exact cents share (ties → earliest
    start), plus that share in bp — where the money actually happens.

    Scale shape: per-batch (type, hour, Σcents) combiner partials — 24
    rows per type per block — fold driver-side; the circular window scan is
    24 integer comparisons per type.""".format(W=_DP_WIN)

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        hod = ((t["ts"].cast(pa.int64()).to_numpy() // _HOUR_US) % 24).astype(
            np.int64
        )
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"ty": et, "h": hod, "s": cents})
            .groupby(["ty", "h"], sort=False)["s"]
            .sum()
            .reset_index()
        )
        return g.astype({"h": np.int64, "s": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["ty", "h"])["s"]
        .sum()
    )
    rows = []
    for ty in sorted(part.index.get_level_values(0).unique()):
        g = part.xs(ty)
        hours = np.zeros(24, np.int64)
        hours[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
        total = int(hours.sum())
        wins = np.array(
            [int(np.roll(hours, -s)[:_DP_WIN].sum()) for s in range(24)],
            np.int64,
        )
        best = int(np.argmax(wins))  # first max → earliest start
        rows.append(
            {
                "event_type": ty,
                "start_hour": best,
                "window_cents": int(wins[best]),
                "share_bp": int(wins[best]) * 10_000 // max(total, 1),
            }
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "start_hour", "window_cents", "share_bp"]
    )
    return out.astype(
        {"start_hour": np.int64, "window_cents": np.int64, "share_bp": np.int64}
    )


ORACLES122["events_daypart_window"] = f"""
WITH h AS (
  SELECT event_type AS ty, (epoch_us(ts) // {_HOUR_US}) % 24 AS h,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS HUGEINT) AS s
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT t.ty, CAST(g.g AS BIGINT) AS h
  FROM (SELECT DISTINCT ty FROM h) t, unnest(range(0, 24)) AS g(g)
),
z AS (
  SELECT grid.ty, grid.h, coalesce(h.s, 0) AS s
  FROM grid LEFT JOIN h ON h.ty = grid.ty AND h.h = grid.h
),
w AS (
  SELECT a.ty, a.h AS start_hour,
         CAST(sum(b.s) AS HUGEINT) AS window_cents
  FROM z a JOIN z b
    ON b.ty = a.ty AND ((b.h - a.h + 24) % 24) < {_DP_WIN}
  GROUP BY 1, 2
),
tot AS (SELECT ty, CAST(sum(s) AS HUGEINT) AS total FROM z GROUP BY 1)
SELECT ty AS event_type,
       CAST(start_hour AS BIGINT) AS start_hour,
       CAST(window_cents AS BIGINT) AS window_cents,
       CAST(window_cents * 10000 // greatest(total, 1) AS BIGINT) AS share_bp
FROM (
  SELECT w.*, tot.total,
         row_number() OVER (PARTITION BY w.ty
                            ORDER BY w.window_cents DESC, w.start_hour) AS rr
  FROM w JOIN tot USING (ty)
) WHERE rr = 1"""


# ---------------------------------------------------------------------------
# conv_escalation_rate — monotone severity climb ending in ERROR
# ---------------------------------------------------------------------------


def q_conv_escalation_rate(sf_dir: str):
    """Burning sessions: a conversation ESCALATES when, in turn order, its
    severity ranks (DEBUG 0 < INFO/UNKNOWN 1 < WARN 2 < ERROR 3) never
    decrease, strictly increase at least once, and the last turn is ERROR.
    Reports the escalating share in exact basis points.

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange (the sessionize shape); the per-bucket kernel is a
    lexsort + vectorized per-conversation monotonicity masks; only
    (n_convs, n_escalating) scalars leave each bucket."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        sev = np.asarray(t["severity"].to_numpy(zero_copy_only=False))
        rank = np.array([_SEV_RANK.get(s, 1) for s in sev], np.int64)
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "rank": rank,
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(_ESC_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        rank = g["rank"].to_numpy(np.int64)
        new = np.r_[True, conv[1:] != conv[:-1]]
        same = ~new
        # per-pair deltas within a conversation (vectorized; reduceat folds
        # them per segment — never one Python pass per conversation)
        dec = (same & (rank < np.r_[np.int64(0), rank[:-1]])).astype(np.int64)
        inc = (same & (rank > np.r_[np.int64(0), rank[:-1]])).astype(np.int64)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(conv)]
        has_dec = np.add.reduceat(dec, starts) > 0
        has_inc = np.add.reduceat(inc, starts) > 0
        last_err = rank[ends - 1] == 3
        n_esc = int((~has_dec & has_inc & last_err).sum())
        return pd.DataFrame(
            {
                "n_convs": np.array([len(starts)], np.int64),
                "n_escalating": np.array([n_esc], np.int64),
            }
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one scalar row per bucket
    )
    n = int(part["n_convs"].sum())
    esc = int(part["n_escalating"].sum())
    return pd.DataFrame(
        {
            "n_convs": np.array([n], np.int64),
            "n_escalating": np.array([esc], np.int64),
            "share_bp": np.array([esc * 10_000 // max(n, 1)], np.int64),
        }
    )


def _escalation_oracle() -> str:
    from .queries import _PARSED_SQL

    arms = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_SEV_RANK.items())
    )
    return (
        _PARSED_SQL
        + f"""
, r AS (
  SELECT conv_id, turn_idx,
         CASE severity {arms} ELSE 1 END AS rank
  FROM parsed
),
d AS (
  SELECT conv_id, rank,
         lag(rank) OVER w AS prev,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx DESC) AS rdesc
  FROM r WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
c AS (
  SELECT conv_id,
         max(CASE WHEN prev IS NOT NULL AND rank < prev THEN 1 ELSE 0 END)
           AS has_dec,
         max(CASE WHEN prev IS NOT NULL AND rank > prev THEN 1 ELSE 0 END)
           AS has_inc,
         max(CASE WHEN rdesc = 1 THEN rank END) AS last_rank
  FROM d GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (has_dec = 0 AND has_inc = 1
                               AND last_rank = 3) AS BIGINT) AS esc
  FROM c
)
SELECT n AS n_convs, esc AS n_escalating,
       CAST(esc * 10000 // greatest(n, 1) AS BIGINT) AS share_bp
FROM s"""
    )


ORACLES122["conv_escalation_rate"] = _escalation_oracle()


QUERIES122 = {
    "events_daypart_window": q_events_daypart_window,
    "conv_escalation_rate": q_conv_escalation_rate,
}
