"""Driver-contract queries, wave 152 — order price-ending census (the
distribution of cents-mod-100: synthetic data and fraud both leave
fingerprints in price endings) and per-role question rate over transcripts
(which side of the dialogue asks — a basic conversation-quality signal).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES152: dict[str, str] = {}


# ---------------------------------------------------------------------------
# orders_cents_endings — distribution of price endings (cents mod 100)
# ---------------------------------------------------------------------------


def q_orders_cents_endings(sf_dir: str):
    """Per cents-ending (o_totalprice cents mod 100): order count and its
    share in micro units, plus the deviation from the uniform 1/100 share in
    micro units (signed) — spikes at .00/.99 betray synthetic or psychological
    pricing. Endings never occurring are absent on both engines.

    Scale shape: per-batch (ending, n) combiner over the bounded 100-slot
    grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"ending": cents % 100, "n": 1})
            .groupby("ending", sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "ending": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
            "dev_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = part.groupby("ending", sort=True)["n"].sum().reset_index(name="n_orders")
    total = float(out["n_orders"].sum())
    share = out["n_orders"].to_numpy(np.float64) / total
    out["share_micro"] = np.floor(share * 1_000_000.0 + 0.5).astype(np.int64)
    out["dev_micro"] = np.floor(
        (share * 100.0 - 1.0) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"ending": np.int64, "n_orders": np.int64})


ORACLES152["orders_cents_endings"] = """
WITH e AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 100 AS ending
  FROM orders
),
g AS (SELECT ending, CAST(count(*) AS BIGINT) AS n_orders FROM e GROUP BY 1),
t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM g)
SELECT ending, n_orders,
       CAST(floor(CAST(n_orders AS DOUBLE) / CAST(t.total AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor((CAST(n_orders AS DOUBLE) / CAST(t.total AS DOUBLE) * 100.0
                   - 1.0) * 1000000.0 + 0.5) AS BIGINT) AS dev_micro
FROM g CROSS JOIN t"""


# ---------------------------------------------------------------------------
# conv_question_rate — share of turns containing a question mark, per role
# ---------------------------------------------------------------------------


def q_conv_question_rate(sf_dir: str):
    """Per role: turns, turns containing at least one '?', and the question
    rate in micro units (floor-half-up; ONE double division over exact int64
    counts).

    Scale shape: per-batch Arrow match_substring + (role, n, q) combiner over
    the bounded role grid; driver fold; no shuffle."""
    import pyarrow.compute as pc

    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        has_q = (
            pc.match_substring(t["text"], "?")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = (
            pd.DataFrame(
                {
                    "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                    "q": has_q,
                }
            )
            .groupby("role", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "q": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
            "n_questions": pd.Series([], dtype=np.int64),
            "question_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("role", sort=True)
        .agg(n_turns=("n", "sum"), n_questions=("q", "sum"))
        .reset_index()
    )
    out["question_micro"] = np.floor(
        out["n_questions"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_turns": np.int64, "n_questions": np.int64})


def _question_rate_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """
SELECT role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (contains(text, '?')) AS BIGINT) AS n_questions,
       CAST(floor(CAST(count(*) FILTER (contains(text, '?')) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS question_micro
FROM transcripts GROUP BY 1"""
    )


ORACLES152["conv_question_rate"] = _question_rate_oracle()


QUERIES152 = {
    "orders_cents_endings": q_orders_cents_endings,
    "conv_question_rate": q_conv_question_rate,
}
