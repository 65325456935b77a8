"""Driver-contract queries, wave 351 — the turn-continuity audit
(conversations with missing or duplicated turn indices) and the Poisson
peak-surprise (how improbable was the busiest day under a homogeneous
rate?). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES351: dict[str, str] = {}

_DAY_US = 86_400_000_000
_PS_TAIL = 300


# ---------------------------------------------------------------------------
# conv_turn_continuity — missing / duplicated turn indices
# ---------------------------------------------------------------------------


def q_conv_turn_continuity(sf_dir: str):
    """Stream-integrity audit: per conversation, the turn indices
    should be a contiguous run; count conversations with gaps
    (max - min + 1 > distinct) and with duplicate indices
    (rows > distinct). Pure integer counting. One row: n_convs,
    n_with_gaps, n_with_dups, n_missing_turns, gap_share_micro.

    Scale shape: ONE conv-bucket exchange; four scalars per bucket."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64)
             for c in ("nc", "ng", "ndup", "nm")}
        )
        if len(g) == 0:
            return zero
        per = g.groupby("conv")["turn"].agg(
            mn="min", mx="max", nd="nunique", n="size"
        )
        span = (per["mx"] - per["mn"] + 1).to_numpy(np.int64)
        nd = per["nd"].to_numpy(np.int64)
        n = per["n"].to_numpy(np.int64)
        gaps = span > nd
        dups = n > nd
        return pd.DataFrame(
            {
                "nc": [np.int64(len(per))],
                "ng": [np.int64(int(gaps.sum()))],
                "ndup": [np.int64(int(dups.sum()))],
                "nm": [np.int64(int((span - nd)[gaps].sum()))],
            }
        )

    p = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_convs", "n_with_gaps", "n_with_dups", "n_missing_turns",
            "gap_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    nc = int(p["nc"])
    if nc == 0:
        return empty
    ng, ndup, nm = int(p["ng"]), int(p["ndup"]), int(p["nm"])
    return pd.DataFrame(
        [
            (
                np.int64(nc), np.int64(ng), np.int64(ndup), np.int64(nm),
                np.int64(np.floor(
                    float(ng) / float(nc) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _continuity_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
per AS (
  SELECT conv_id,
         CAST(max(turn_idx) - min(turn_idx) + 1 AS BIGINT) AS span,
         CAST(count(DISTINCT turn_idx) AS BIGINT) AS nd,
         CAST(count(*) AS BIGINT) AS n
  FROM transcripts GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN span > nd THEN 1 ELSE 0 END) AS BIGINT) AS ng,
         CAST(sum(CASE WHEN n > nd THEN 1 ELSE 0 END) AS BIGINT) AS ndup,
         CAST(coalesce(sum(CASE WHEN span > nd THEN span - nd END), 0)
              AS BIGINT) AS nm
  FROM per
)
SELECT nc AS n_convs, ng AS n_with_gaps, ndup AS n_with_dups,
       nm AS n_missing_turns,
       CAST(floor(CAST(ng AS DOUBLE) / nc * 1000000.0 + 0.5) AS BIGINT)
         AS gap_share_micro
FROM agg
WHERE nc > 0"""
    )


# ---------------------------------------------------------------------------
# events_peak_surprise — Poisson tail probability of the busiest day
# ---------------------------------------------------------------------------


def q_events_peak_surprise(sf_dir: str):
    """Peak surprise: under a homogeneous Poisson day rate
    lambda = N / n_days, the expected number of days at or above the
    observed peak is n_days * P(X >= peak); the tail sums 300 mirrored
    lgamma-based terms. One row: peak_count, n_days, lambda_micro,
    expected_days_nano (floor(E * 1e9)), surprising (E < 0.05)."""
    from math import lgamma

    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["peak_count", "n_days", "lambda_micro", "expected_days_nano",
            "surprising"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    total = int(y.sum())
    if n == 0 or total == 0:
        return empty
    peak = int(y.max())
    lam = float(total) / float(n)
    ln_lam = float(np.log(lam))
    tail = 0.0
    for k in range(peak, peak + _PS_TAIL):
        tail += float(np.exp(
            float(k) * ln_lam - lam - lgamma(float(k) + 1.0)
        ))
    e_days = float(n) * tail
    return pd.DataFrame(
        [
            (
                np.int64(peak), np.int64(n),
                np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
                np.int64(np.floor(e_days * 1_000_000_000.0 + 0.5)),
                np.int64(1 if e_days < 0.05 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES351["events_peak_surprise"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS tot,
         CAST(max(y) AS BIGINT) AS peak
  FROM x
),
lam AS (
  SELECT n, peak, CAST(tot AS DOUBLE) / n AS l FROM nn
  WHERE n > 0 AND tot > 0
),
terms AS (
  SELECT lam.n, lam.peak, lam.l,
         exp(CAST(lam.peak + r.range AS DOUBLE) * ln(lam.l) - lam.l
             - lgamma(CAST(lam.peak + r.range AS DOUBLE) + 1.0)) AS t
  FROM lam CROSS JOIN range(0, {_PS_TAIL}) r
),
tail AS (
  SELECT max(n) AS n, max(peak) AS peak, max(l) AS l, sum(t) AS p
  FROM terms
)
SELECT CAST(peak AS BIGINT) AS peak_count, CAST(n AS BIGINT) AS n_days,
       CAST(floor(l * 1000000.0 + 0.5) AS BIGINT) AS lambda_micro,
       CAST(floor(CAST(n AS DOUBLE) * p * 1000000000.0 + 0.5) AS BIGINT)
         AS expected_days_nano,
       CAST(CASE WHEN CAST(n AS DOUBLE) * p < 0.05 THEN 1 ELSE 0 END
            AS BIGINT) AS surprising
FROM tail"""


def _register_dynamic() -> None:
    ORACLES351["conv_turn_continuity"] = _continuity_oracle()


_register_dynamic()

QUERIES351 = {
    "conv_turn_continuity": q_conv_turn_continuity,
    "events_peak_surprise": q_events_peak_surprise,
}
