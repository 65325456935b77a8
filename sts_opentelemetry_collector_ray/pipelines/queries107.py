"""Driver-contract queries, wave 107 — orderkey sequence-gap audit (missing
id ranges between the corpus min and max: the ingestion-completeness check
that catches dropped chunks) and per-role transcript verbosity (chars per
turn by role over the derived transcript corpus — the flagship-family
reporting surface). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES107: dict[str, str] = {}

_GAP_RANGE = 4096  # orderkeys per id-range bucket


# ---------------------------------------------------------------------------
# orders_sequence_gaps — missing orderkey ranges (completeness audit)
# ---------------------------------------------------------------------------


def q_orders_sequence_gaps(sf_dir: str):
    """Sequence completeness: every maximal missing orderkey run
    [gap_start, gap_end] strictly inside the corpus [min, max] — a dropped
    ingest chunk shows up as one fat gap row.

    Scale shape: keys bucket by id-range (k // {R}), so each bucket owns a
    DISJOINT key interval and finds its internal gaps with one sorted
    unique + diff — and because range buckets tile the id axis, a gap that
    spans bucket borders is recovered by clipping each bucket's view to
    [bucket_lo, bucket_hi] and emitting edge gaps; adjacent edge gaps merge
    in a bounded driver pass (≤2 edge rows per bucket). A tiny min/max
    pre-pass anchors the global range.""".format(R=_GAP_RANGE)

    def bounds(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({"lo": [int(k.min())], "hi": [int(k.max())]})

    b = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .map_batches(bounds, batch_format="pyarrow")
        .to_pandas()
    )
    glo, ghi = int(b["lo"].min()), int(b["hi"].max())

    def partial(t: pa.Table) -> pd.DataFrame:
        k = np.unique(t["o_orderkey"].to_numpy().astype(np.int64))
        return pd.DataFrame({"k": k, "_b": k // _GAP_RANGE})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(np.int64))
        bkt = int(k[0] // _GAP_RANGE)
        lo = max(bkt * _GAP_RANGE, glo)
        hi = min((bkt + 1) * _GAP_RANGE - 1, ghi)
        # present keys inside [lo, hi]; synthesize sentinels at lo-1 / hi+1
        kk = np.concatenate([[lo - 1], k[(k >= lo) & (k <= hi)], [hi + 1]])
        d = np.diff(kk)
        gaps = np.flatnonzero(d > 1)
        # marker row (gap_start = -1) announces this bucket is PRESENT so the
        # driver can synthesize whole-bucket gaps for absent bucket ids
        rows = pd.DataFrame(
            {
                "gap_start": np.r_[np.int64(-1), kk[gaps] + 1],
                "gap_end": np.r_[np.int64(bkt), kk[gaps + 1] - 1],
            }
        )
        return rows.astype(np.int64)

    part = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: gap rows only (edge rows ≤ 2 per bucket)
    )
    if part.empty:
        return pd.DataFrame(
            {
                "gap_start": pd.Series([], dtype=np.int64),
                "gap_end": pd.Series([], dtype=np.int64),
                "n_missing": pd.Series([], dtype=np.int64),
            }
        )
    markers = part[part["gap_start"] == -1]
    present = np.sort(markers["gap_end"].to_numpy(np.int64))
    part = part[part["gap_start"] >= 0]
    # absent bucket runs between consecutive present buckets ⇒ whole gaps
    whole = []
    for b1, b2 in zip(present[:-1], present[1:]):
        if b2 > b1 + 1:
            whole.append(
                {
                    "gap_start": (b1 + 1) * _GAP_RANGE,
                    "gap_end": b2 * _GAP_RANGE - 1,
                }
            )
    if whole:
        part = pd.concat([part, pd.DataFrame(whole)], ignore_index=True)
    if part.empty:
        return pd.DataFrame(
            {
                "gap_start": pd.Series([], dtype=np.int64),
                "gap_end": pd.Series([], dtype=np.int64),
                "n_missing": pd.Series([], dtype=np.int64),
            }
        )
    part = part.sort_values("gap_start").reset_index(drop=True)
    # merge gaps that touch across bucket borders
    s = part["gap_start"].to_numpy(np.int64)
    e = part["gap_end"].to_numpy(np.int64)
    keep_start = np.r_[True, s[1:] != e[:-1] + 1]
    grp = np.cumsum(keep_start) - 1
    out = pd.DataFrame({"g": grp, "s": s, "e": e}).groupby("g").agg(
        gap_start=("s", "min"), gap_end=("e", "max")
    )
    out["n_missing"] = out["gap_end"] - out["gap_start"] + 1
    return out.reset_index(drop=True).astype(np.int64)


ORACLES107["orders_sequence_gaps"] = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
d AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM k)
SELECT CAST(k + 1 AS BIGINT) AS gap_start,
       CAST(nxt - 1 AS BIGINT) AS gap_end,
       CAST(nxt - k - 1 AS BIGINT) AS n_missing
FROM d WHERE nxt - k > 1"""


# ---------------------------------------------------------------------------
# transcripts_role_verbosity — chars per turn by role
# ---------------------------------------------------------------------------


def q_transcripts_role_verbosity(sf_dir: str):
    """Verbosity by role over the derived transcripts: turns, total text
    chars and the exact floor-division chars-per-turn in micro — the
    context-budget planning readout for agent logs.

    Scale shape: per-batch (role, n, chars) combiner partials — |roles|
    rows per block — fold on the driver; no shuffle."""
    from ..sources.transcripts import derive_transcripts_from_events

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        role = np.asarray(t["role"].to_numpy(zero_copy_only=False))
        chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"role": role, "chars": chars})
            .groupby("role", sort=False)["chars"]
            .agg(["size", "sum"])
            .reset_index()
        )
        g.columns = ["role", "n_turns", "total_chars"]
        return g.astype({"n_turns": np.int64, "total_chars": np.int64})

    part = (
        derive_transcripts_from_events(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = part.groupby("role", sort=True)[["n_turns", "total_chars"]].sum().reset_index()
    n = g["n_turns"].to_numpy(np.int64)
    c = g["total_chars"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "role": g["role"].to_numpy(object),
            "n_turns": n,
            "total_chars": c,
            "chars_per_turn_micro": c * 1_000_000 // np.maximum(n, 1),
        }
    )


def _verbosity_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) * 1000000 // greatest(count(*), 1) AS BIGINT)
         AS chars_per_turn_micro
FROM transcripts GROUP BY role"""
    )


ORACLES107["transcripts_role_verbosity"] = _verbosity_oracle()


QUERIES107 = {
    "orders_sequence_gaps": q_orders_sequence_gaps,
    "transcripts_role_verbosity": q_transcripts_role_verbosity,
}
