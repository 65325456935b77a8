"""Driver-contract queries, wave 24 — sliding-window exact COUNT DISTINCT
(rolling unique users per type without re-scanning rows) and role-sequence
trigram mining over conversations. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ORACLES24: dict[str, str] = {}

_WD_BUCKETS = 64
_WD_DAYS = 3  # window [day-2, day]
_RT_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_window_distinct — rolling 3-day distinct users per (type, day)
# ---------------------------------------------------------------------------


def q_events_window_distinct(sf_dir: str):
    """Exact sliding-window COUNT DISTINCT: unique users per event_type over
    the trailing 3-day window ending at each observed (type, day). Rows never
    re-scan per window: one pass reduces to per-batch-distinct (type, day,
    user) triples, each triple EXPLODES to the ≤3 windows it can serve
    (filtered against the broadcast observed-(type,day) set — a
    calendar-bounded constant), and ONE user-bucket exchange dedups
    (type, window, user) before tiny per-window count partials sum. The
    exchange carries distinct triples ×3, never events."""
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"

    # observed (type, day) pairs: tiny (|types| × calendar days), broadcast
    def td_partial(t: pa.Table) -> pa.Table:
        days = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "d": days}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    td = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(td_partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    observed = set(zip(td["event_type"], td["d"]))
    obs_ref = ray.put(observed)

    def explode(t: pa.Table) -> pa.Table:
        obs = ray.get(obs_ref)
        days = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "d": days,
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        parts = []
        for off in range(_WD_DAYS):
            p = df.copy()
            p["w"] = p["d"] + off
            parts.append(p)
        out = pd.concat(parts, ignore_index=True)
        keep = [
            (et, w) in obs
            for et, w in zip(out["event_type"].to_numpy(), out["w"].to_numpy())
        ]
        out = out.loc[np.array(keep, dtype=bool), ["event_type", "w", "user_id"]]
        out = out.drop_duplicates()
        out["_b"] = (
            out["user_id"].to_numpy().astype(np.uint64) % _WD_BUCKETS
        ).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["event_type", "w", "user_id"])
        out = (
            u.groupby(["event_type", "w"], sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        out["pn"] = out["pn"].astype(np.int64)
        return out

    partials = (
        ray.data.read_parquet(path, columns=["event_type", "ts", "user_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    agg = partials.groupby(["event_type", "w"]).aggregate(
        Sum("pn", alias_name="n_users")
    )

    def finish(t: pa.Table) -> pa.Table:
        day = (t["w"].to_numpy() * 86_400_000_000).astype("datetime64[us]")
        return pa.table(
            {"event_type": t["event_type"], "day": pa.array(day), "n_users": t["n_users"]}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLES24["events_window_distinct"] = """
WITH td AS (SELECT DISTINCT event_type, date_trunc('day', ts) AS day FROM events),
tu AS (SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
       FROM events)
SELECT td.event_type, td.day, CAST(count(DISTINCT tu.user_id) AS BIGINT) AS n_users
FROM td JOIN tu ON tu.event_type = td.event_type
               AND tu.day BETWEEN td.day - INTERVAL 2 DAY AND td.day
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# conv_role_trigrams — top role sequences of length 3 within conversations
# ---------------------------------------------------------------------------


def q_conv_role_trigrams(sf_dir: str):
    """Role-sequence mining: the 10 most common (role, next, next²) patterns
    within conversations in turn order — the behavioral-motif counterpart of
    `conv_tool_transitions`. ONE bounded conv-bucket exchange + double
    shift-compare per bucket; ≤|roles|³ aggregate groups."""
    from ray.data.aggregate import Sum

    _ROLE_MAP = {
        "error": "tool",
        "purchase": "assistant",
        "signup": "system",
        "click": "user",
        "view": "user",
    }

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "role": df["event_type"].map(_ROLE_MAP).to_numpy(dtype=object),
                "_b": (
                    df["user_id"].to_numpy().astype(np.uint64) % _RT_BUCKETS
                ).astype(np.int32),
            }
        )

    def trigrams(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "r1": pd.Series([], dtype=object),
                "r2": pd.Series([], dtype=object),
                "r3": pd.Series([], dtype=object),
                "pn": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 3:
            return empty
        g = g.sort_values(["conv", "ts", "event_id"], kind="mergesort")
        conv = g["conv"].to_numpy()
        role = g["role"].to_numpy(dtype=object)
        same = (conv[:-2] == conv[1:-1]) & (conv[1:-1] == conv[2:])
        if not same.any():
            return empty
        out = (
            pd.DataFrame(
                {
                    "r1": role[:-2][same],
                    "r2": role[1:-1][same],
                    "r3": role[2:][same],
                }
            )
            .groupby(["r1", "r2", "r3"], sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        out["pn"] = out["pn"].astype(np.int64)
        return out

    partials = (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("_b")
        .map_groups(trigrams, batch_format="pandas")
    )
    agg = partials.groupby(["r1", "r2", "r3"]).aggregate(Sum("pn", alias_name="n"))
    return agg.sort(["n", "r1", "r2", "r3"], descending=[True, False, False, False]).limit(
        10
    )


ORACLES24["conv_role_trigrams"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """,
tr AS (
  SELECT role AS r1,
         lead(role, 1) OVER w AS r2,
         lead(role, 2) OVER w AS r3
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT r1, r2, r3, count(*) AS n
FROM tr WHERE r2 IS NOT NULL AND r3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, r1, r2, r3 LIMIT 10"""
)


QUERIES24 = {
    "events_window_distinct": q_events_window_distinct,
    "conv_role_trigrams": q_conv_role_trigrams,
}
