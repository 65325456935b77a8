"""Driver-contract queries, wave 180 — the role-transition gap matrix over
transcripts: for each (previous role → role) handoff, how many transitions
and the exact average wall-clock gap — where conversations actually spend
their time (user think-time vs assistant latency vs tool execution). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES180: dict[str, str] = {}


def q_conv_role_gap_matrix(sf_dir: str):
    """Per (prev_role, role) over consecutive turns of the same
    conversation: transition count, exact summed gap µs, and average gap in
    micro-µs (floor-half-up; ONE double division).

    Scale shape: turns ride ONE conv-bucket exchange; per-bucket lexsort +
    shifted compares emit bounded (prev, next, n, µs) partials — ≤ |roles|²
    per bucket — folded on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("role",))
        df["ts_us"] = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "prev_role": pd.Series([], dtype=object),
                "role": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        ts = g["ts_us"].to_numpy(np.int64)
        same = conv[1:] == conv[:-1]
        if not same.any():
            return empty
        return (
            pd.DataFrame(
                {
                    "prev_role": role[:-1][same],
                    "role": role[1:][same],
                    "n": 1,
                    "us": (ts[1:] - ts[:-1])[same],
                }
            )
            .groupby(["prev_role", "role"], sort=False, as_index=False)
            .sum()
            .astype({"n": np.int64, "us": np.int64})
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "prev_role": pd.Series([], dtype=object),
            "role": pd.Series([], dtype=object),
            "n_transitions": pd.Series([], dtype=np.int64),
            "sum_us": pd.Series([], dtype=np.int64),
            "avg_us_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "prev_role" not in part.columns:
        return empty
    out = (
        part.groupby(["prev_role", "role"], sort=True)
        .agg(n_transitions=("n", "sum"), sum_us=("us", "sum"))
        .reset_index()
    )
    out["avg_us_micro"] = np.floor(
        out["sum_us"].to_numpy(np.float64)
        / out["n_transitions"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_transitions": np.int64, "sum_us": np.int64})


def _role_gap_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
p AS (
  SELECT conv_id, role,
         lag(role) OVER w AS prev_role,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
g AS (
  SELECT prev_role, role,
         CAST(count(*) AS BIGINT) AS n_transitions,
         CAST(sum(gap) AS BIGINT) AS sum_us
  FROM p WHERE prev_role IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_role, role, n_transitions, sum_us,
       CAST(floor(CAST(sum_us AS DOUBLE) / CAST(n_transitions AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_us_micro
FROM g"""
    )


ORACLES180["conv_role_gap_matrix"] = _role_gap_oracle()


QUERIES180 = {
    "conv_role_gap_matrix": q_conv_role_gap_matrix,
}
