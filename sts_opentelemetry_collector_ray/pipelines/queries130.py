"""Driver-contract queries, wave 130 — tie-corrected Spearman rank correlation
between quantity and discount per returnflag (does the discount ladder move
with order size?), and the per-role transcript turn duplication rate (how much
of each role's turn text is repeated — the dedup-opportunity census a
training-data curator reads before enabling turn-level dedup). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES130: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_spearman — tie-corrected Spearman rho(quantity, discount) per flag
# ---------------------------------------------------------------------------


def q_lineitem_spearman(sf_dir: str):
    """Spearman rank correlation with exact tie handling: both columns are
    integer-valued after rounding (quantity 1..50, discount cents 0..10), so
    the whole statistic is a function of the bounded (flag, quantity, discount)
    contingency table. Average ranks come from the marginals — for value v with
    count c and L items strictly below, the doubled 1-based average rank is
    R = 2L + c + 1 (integer, no .5 floats) — and rho is Pearson over the
    doubled ranks with EXACT integer moment sums (Python bigint on the Ray
    side, HUGEINT in DuckDB), finished by ONE identical double expression:
    floor(num / (sqrt(dxx) * sqrt(dyy)) * 1e6 + 0.5).

    Scale shape: per-batch (flag, quantity, discount, n) combiner partials —
    at most |flags| x 50 x 11 rows per block — fold on the driver; no shuffle.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        d = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rf = np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False))
        g = (
            pd.DataFrame({"rf": rf, "q": q, "d": d, "n": 1})
            .groupby(["rf", "q", "d"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"q": np.int64, "d": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |flags| x 50 x 11 rows per block
    )
    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "spearman_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    ct = (
        part.groupby(["rf", "q", "d"], sort=True)["n"].sum().reset_index()
    )
    rows: list[tuple[str, int, int]] = []
    for rf, g in ct.groupby("rf", sort=True):
        # doubled average ranks from the marginals (exclusive-cumsum = L)
        dbl_rank: dict[str, dict[int, int]] = {}
        for col in ("q", "d"):
            m = g.groupby(col, sort=True)["n"].sum()
            run = 0
            r: dict[int, int] = {}
            for v, c in m.items():
                c = int(c)
                r[int(v)] = 2 * run + c + 1
                run += c
            dbl_rank[col] = r
        n = sx = sy = sxx = syy = sxy = 0
        for q, d, c in zip(
            g["q"].to_numpy(np.int64),
            g["d"].to_numpy(np.int64),
            g["n"].to_numpy(np.int64),
        ):
            rq, rd, c = dbl_rank["q"][int(q)], dbl_rank["d"][int(d)], int(c)
            n += c
            sx += c * rq
            sy += c * rd
            sxx += c * rq * rq
            syy += c * rd * rd
            sxy += c * rq * rd
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        if dxx <= 0 or dyy <= 0:
            continue  # a constant column has no rank correlation
        num = n * sxy - sx * sy
        den = math.sqrt(float(dxx)) * math.sqrt(float(dyy))
        micro = int(math.floor(float(num) / den * 1_000_000.0 + 0.5))
        rows.append((str(rf), n, micro))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows", "spearman_micro"])
    return out.astype({"n_rows": np.int64, "spearman_micro": np.int64})


ORACLES130["lineitem_spearman"] = """
WITH li AS (
  SELECT l_returnflag AS rf,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d
  FROM lineitem
),
ct AS (SELECT rf, q, d, CAST(count(*) AS HUGEINT) AS c FROM li GROUP BY 1, 2, 3),
qm AS (SELECT rf, q, sum(c) AS cq FROM ct GROUP BY 1, 2),
qr AS (SELECT rf, q,
              2 * coalesce(sum(cq) OVER (PARTITION BY rf ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cq + 1 AS rq
       FROM qm),
dm AS (SELECT rf, d, sum(c) AS cd FROM ct GROUP BY 1, 2),
dr AS (SELECT rf, d,
              2 * coalesce(sum(cd) OVER (PARTITION BY rf ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cd + 1 AS rd
       FROM dm),
s AS (
  SELECT ct.rf,
         sum(ct.c) AS n,
         sum(ct.c * qr.rq) AS sx,
         sum(ct.c * dr.rd) AS sy,
         sum(ct.c * qr.rq * qr.rq) AS sxx,
         sum(ct.c * dr.rd * dr.rd) AS syy,
         sum(ct.c * qr.rq * dr.rd) AS sxy
  FROM ct
  JOIN qr ON ct.rf = qr.rf AND ct.q = qr.q
  JOIN dr ON ct.rf = dr.rf AND ct.d = dr.d
  GROUP BY 1
)
SELECT rf AS l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS spearman_micro
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""


# ---------------------------------------------------------------------------
# conv_turn_dup_rate — per-role exact turn-text duplication census
# ---------------------------------------------------------------------------


def q_conv_turn_dup_rate(sf_dir: str):
    """Turn-level dedup opportunity: per role, total turns, exactly-distinct
    turn texts, and the duplicate share in micro units (floor-half-up; ONE
    double division over exact int64 counts).

    Scale shape: per-batch (role, text) -> count combiner (only distinct pairs
    with their counts leave each block), ONE text-hash bucket exchange (a
    distinct (role, text) pair lands wholly in one bucket), per-bucket
    vectorized re-reduce to (role, n_turns, n_distinct) partials — <= |roles|
    rows per bucket — folded on the driver. Turn text never crosses the
    exchange more than once and never lands on the driver."""
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
        out = (
            gg.groupby("role", sort=False)
            .agg(n_turns=("n", "sum"), n_distinct=("text", "count"))
            .reset_index()
        )
        return out.astype({"n_turns": np.int64, "n_distinct": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |roles| rows per bucket
    )
    if part.empty or "role" not in part.columns:
        return pd.DataFrame(
            {
                "role": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_distinct": pd.Series([], dtype=np.int64),
                "dup_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby("role", sort=True)
        .agg(n_turns=("n_turns", "sum"), n_distinct=("n_distinct", "sum"))
        .reset_index()
    )
    nt = out["n_turns"].to_numpy(np.int64)
    nd = out["n_distinct"].to_numpy(np.int64)
    out["dup_micro"] = np.floor(
        (nt - nd).astype(np.float64) / nt.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    for c in ("n_turns", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out[["role", "n_turns", "n_distinct", "dup_micro"]]


def _turn_dup_rate_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
g AS (
  SELECT role,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
  FROM transcripts GROUP BY 1
)
SELECT role, n_turns, n_distinct,
       CAST(floor(CAST(n_turns - n_distinct AS DOUBLE)
                  / CAST(n_turns AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS dup_micro
FROM g"""
    )


ORACLES130["conv_turn_dup_rate"] = _turn_dup_rate_oracle()


QUERIES130 = {
    "lineitem_spearman": q_lineitem_spearman,
    "conv_turn_dup_rate": q_conv_turn_dup_rate,
}
