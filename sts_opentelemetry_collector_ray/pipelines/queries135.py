"""Driver-contract queries, wave 135 — boilerplate-turn detection (the top-K
most repeated (role, text) turns with corpus share: templated/filler turns a
transcript-curation pipeline strips before training) and per-conversation
turn-taking alternation (role-switch rate along the turn order — dialogues
that degenerate into single-role monologues score near zero). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES135: dict[str, str] = {}

_TOPK = 20


# ---------------------------------------------------------------------------
# conv_boilerplate_topk — most repeated (role, text) turns with corpus share
# ---------------------------------------------------------------------------


def q_conv_boilerplate_topk(sf_dir: str):
    """Top-20 exactly repeated (role, text) turn pairs by count, ranked by
    (n DESC, role, text) with the corpus share in micro units (floor-half-up;
    ONE double division over exact int64 counts).

    Scale shape: per-batch (role, text) -> count combiner (only distinct
    pairs with counts leave each block), ONE text-hash bucket exchange (a
    distinct pair lands wholly in one bucket — the conv_turn_dup_rate
    precedent), per-bucket re-reduce + local top-20 under the GLOBAL ordering
    key; each bucket also reports its turn total, so the driver merges
    <= 64×20 candidate rows + 64 totals. Turn text crosses the exchange once
    and only the candidates reach the driver."""
    from ..functions.hashing import fnv1a32_arrow
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                    "text": np.asarray(t["text"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                }
            )
            .groupby(["role", "text"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        h = fnv1a32_arrow(pa.array(g["text"], type=pa.string()))
        g["_b"] = (h % 64).astype(np.int64)
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["role", "text"], sort=False)["n"].sum().reset_index()
        tot = int(gg["n"].sum())
        top = gg.sort_values(
            ["n", "role", "text"], ascending=[False, True, True], kind="mergesort"
        ).head(_TOPK)
        out = top.assign(tot=tot)
        return out.astype({"n": np.int64, "tot": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: merge(g).assign(_b=g["_b"].iloc[0] if len(g) else -1),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: <= 64 buckets × 20 candidate rows
    )
    empty = pd.DataFrame(
        {
            "rank": pd.Series([], dtype=np.int64),
            "role": pd.Series([], dtype=object),
            "text": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "role" not in part.columns:
        return empty
    total = int(part.drop_duplicates("_b")["tot"].sum())
    top = (
        part.sort_values(
            ["n", "role", "text"], ascending=[False, True, True], kind="mergesort"
        )
        .head(_TOPK)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["share_micro"] = np.floor(
        top["n"].to_numpy(np.float64) / float(total) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    top = top.rename(columns={"n": "n_turns"})
    return top[["rank", "role", "text", "n_turns", "share_micro"]].astype(
        {"rank": np.int64, "n_turns": np.int64, "share_micro": np.int64}
    )


def _boilerplate_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""",
g AS (
  SELECT role, text, CAST(count(*) AS BIGINT) AS n_turns
  FROM transcripts GROUP BY 1, 2
),
r AS (
  SELECT role, text, n_turns,
         row_number() OVER (ORDER BY n_turns DESC, role, text) AS rk
  FROM g
)
SELECT CAST(rk AS BIGINT) AS rank, role, text, n_turns,
       CAST(floor(CAST(n_turns AS DOUBLE)
                  / CAST((SELECT count(*) FROM transcripts) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM r WHERE rk <= {_TOPK}"""
    )


ORACLES135["conv_boilerplate_topk"] = _boilerplate_oracle()


# ---------------------------------------------------------------------------
# conv_turn_alternation — per-conversation role-switch rate along turn order
# ---------------------------------------------------------------------------


def q_conv_turn_alternation(sf_dir: str):
    """Turn-taking census: per conversation with >= 2 turns, the number of
    adjacent turn pairs whose role CHANGES, and the switch rate over the
    n_turns - 1 pairs in micro units (floor-half-up). Single-turn
    conversations are absent on both engines.

    Scale shape: turns co-locate per conversation through ONE conv-bucket
    exchange; per-bucket lexsort + shifted-array compares + np.add.reduceat
    emit one row per conversation — no per-group Python."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role",))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_switches": pd.Series([], dtype=np.int64),
                "switch_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        n = len(g)
        new = np.r_[True, conv[1:] != conv[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, n]).astype(np.int64)
        # a switch: adjacent rows in the SAME conversation with differing roles
        sw = np.r_[False, (role[1:] != role[:-1]) & ~new[1:]].astype(np.int64)
        switches = np.add.reduceat(sw, starts).astype(np.int64)
        ok = counts >= 2
        if not ok.any():
            return empty
        counts, switches = counts[ok], switches[ok]
        micro = np.floor(
            switches.astype(np.float64)
            / (counts - 1).astype(np.float64)
            * 1_000_000.0
            + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": conv[starts[ok]],
                "n_turns": counts,
                "n_switches": switches,
                "switch_micro": micro,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _alternation_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
t AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM transcripts
),
g AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(*) FILTER (prev IS NOT NULL AND role <> prev) AS BIGINT)
           AS n_switches
  FROM t GROUP BY 1 HAVING count(*) >= 2
)
SELECT conv_id, n_turns, n_switches,
       CAST(floor(CAST(n_switches AS DOUBLE) / CAST(n_turns - 1 AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS switch_micro
FROM g"""
    )


ORACLES135["conv_turn_alternation"] = _alternation_oracle()


QUERIES135 = {
    "conv_boilerplate_topk": q_conv_boilerplate_topk,
    "conv_turn_alternation": q_conv_turn_alternation,
}
