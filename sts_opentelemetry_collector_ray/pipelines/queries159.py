"""Driver-contract queries, wave 159 — within-conversation self-repetition
(turns whose exact text already appeared EARLIER in the same conversation:
the loop/stuck-agent detector) and per-type CVaR (expected value above the
p90 cutoff — the tail-burden metric, exact from the distinct-cents
histogram). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES159: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_self_repetition — turns repeating an earlier turn of the same conv
# ---------------------------------------------------------------------------


def q_conv_self_repetition(sf_dir: str):
    """Per role: turns whose exact text already occurred at a SMALLER
    turn_idx within the same conversation (any role — a repeat is a repeat),
    total turns, and the repetition share in micro units.

    Scale shape: (conv, turn, role, text) rides ONE conv-bucket exchange;
    per-bucket lexsort by (conv, text, turn) marks first occurrences with a
    shifted compare — no per-group Python — and bounded (role, n, rep)
    partials fold on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role", "text"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "role": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "rep": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "text", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        text = g["text"].to_numpy(object)
        first = np.r_[
            True, (conv[1:] != conv[:-1]) | (text[1:] != text[:-1])
        ]
        rep = (~first).astype(np.int64)
        return (
            pd.DataFrame({"role": g["role"].to_numpy(object), "n": 1, "rep": rep})
            .groupby("role", sort=False, as_index=False)
            .sum()
            .astype({"n": np.int64, "rep": np.int64})
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
            "n_repeats": pd.Series([], dtype=np.int64),
            "repeat_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "role" not in part.columns:
        return empty
    out = (
        part.groupby("role", sort=True)
        .agg(n_turns=("n", "sum"), n_repeats=("rep", "sum"))
        .reset_index()
    )
    out["repeat_micro"] = np.floor(
        out["n_repeats"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_turns": np.int64, "n_repeats": np.int64})


def _self_repetition_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
m AS (
  SELECT role,
         CASE WHEN turn_idx > min(turn_idx) OVER (PARTITION BY conv_id, text)
              THEN 1 ELSE 0 END AS rep
  FROM transcripts
),
g AS (
  SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(rep) AS BIGINT) AS n_repeats
  FROM m GROUP BY 1
)
SELECT role, n_turns, n_repeats,
       CAST(floor(CAST(n_repeats AS DOUBLE) / CAST(n_turns AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS repeat_micro
FROM g"""
    )


ORACLES159["conv_self_repetition"] = _self_repetition_oracle()


# ---------------------------------------------------------------------------
# events_cvar — expected value in the p90 tail, per type
# ---------------------------------------------------------------------------


def q_events_cvar(sf_dir: str):
    """Per event type: n, the p90 cents cutoff (integer-rational rank pick,
    the quantile-engine contract), the tail count (values ≥ cutoff — ties
    included), and the tail's average value in micro-cents — CVaR, exact
    from the distinct-cents histogram.

    Scale shape: per-batch (type, cents) histogram combiner, driver-side
    cumulative pick over the bounded distinct-cents grid; no row exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "cents": cents,
                    "cnt": 1,
                }
            )
            .groupby(["event_type", "cents"], sort=False, as_index=False)["cnt"]
            .sum()
        )
        return g.astype({"cents": np.int64, "cnt": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "cutoff_cents": pd.Series([], dtype=np.int64),
            "tail_n": pd.Series([], dtype=np.int64),
            "cvar_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    hist = (
        part.groupby(["event_type", "cents"], sort=True)["cnt"].sum().reset_index()
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rank = (n * 9 + 9) // 10
        i = int(np.searchsorted(cum, rank, side="left"))
        cutoff = int(vals[i])
        tail = vals >= cutoff
        tail_n = int(cnts[tail].sum())
        tail_mass = int((vals[tail] * cnts[tail]).sum())
        cvar = int(np.floor(tail_mass / float(tail_n) * 1_000_000.0 + 0.5))
        rows.append((et, n, cutoff, tail_n, cvar))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "cutoff_cents", "tail_n", "cvar_micro"]
    ).astype(
        {
            "n": np.int64,
            "cutoff_cents": np.int64,
            "tail_n": np.int64,
            "cvar_micro": np.int64,
        }
    )


ORACLES159["events_cvar"] = """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum
  FROM c
),
cut AS (
  SELECT t.event_type, t.n, min(cum.cents) AS cutoff
  FROM t JOIN cum ON cum.event_type = t.event_type
              AND cum.cum >= (t.n * 9 + 9) // 10
  GROUP BY 1, 2
),
tail AS (
  SELECT c.event_type,
         CAST(sum(c.cnt) AS BIGINT) AS tail_n,
         CAST(sum(c.cents * c.cnt) AS BIGINT) AS tail_mass
  FROM c JOIN cut ON cut.event_type = c.event_type
  WHERE c.cents >= cut.cutoff
  GROUP BY 1
)
SELECT cut.event_type, cut.n,
       CAST(cut.cutoff AS BIGINT) AS cutoff_cents,
       tail.tail_n,
       CAST(floor(CAST(tail.tail_mass AS DOUBLE) / CAST(tail.tail_n AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS cvar_micro
FROM cut JOIN tail USING (event_type)"""


QUERIES159 = {
    "conv_self_repetition": q_conv_self_repetition,
    "events_cvar": q_events_cvar,
}
