"""Driver-contract queries, wave 138 — nation revenue rank stability year
over year (tie-corrected Spearman between adjacent years' nation revenue
rankings: does the league table reshuffle?) and turn-depth verbosity (average
turn length as a function of turn index — do replies bloat as context grows?).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES138: dict[str, str] = {}


# ---------------------------------------------------------------------------
# nation_rank_stability — adjacent-year Spearman of nation revenue rankings
# ---------------------------------------------------------------------------


def _doubled_ranks(vals: np.ndarray) -> np.ndarray:
    """Doubled average ranks (2×avg-rank stays integer under ties):
    dr(v) = 2·|{u < v}| + |{u = v}| + 1."""
    order = np.argsort(vals, kind="mergesort")
    sv = vals[order]
    uniq, start, cnt = np.unique(sv, return_index=True, return_counts=True)
    dr_u = 2 * start + cnt + 1  # start = count of strictly-smaller values
    pos = np.searchsorted(uniq, vals)
    return dr_u[pos].astype(np.int64)


def q_nation_rank_stability(sf_dir: str):
    """For each adjacent year pair (y, y+1): how strongly the per-nation
    order-revenue ranking (total o_totalprice in exact cents, floor-half-up)
    correlates between the two years — tie-corrected Spearman in micro units.
    Ranks are doubled average ranks computed WITHIN each year over all
    nations with revenue that year; the correlation runs over nations present
    in BOTH years (documented contract). Pairs where either year's ranks are
    constant are absent on both engines.

    Scale shape: orders ⋈ customer (Dataset hash join on custkey), then a
    per-batch (year, nation) cents combiner — the partials are the bounded
    |years| × |nations| grid — and every rank/moment step is exact Python-int
    math on that grid at the driver; ONE shared double finish."""
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = o.join(
        c,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        year = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "y": year,
                    "nk": t["c_nationkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "rev": cents,
                }
            )
            .groupby(["y", "nk"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        return g.astype({"y": np.int64, "nk": np.int64, "rev": np.int64})

    part = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "year_from": pd.Series([], dtype=np.int64),
            "year_to": pd.Series([], dtype=np.int64),
            "n_nations": pd.Series([], dtype=np.int64),
            "spearman_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby(["y", "nk"], sort=True)["rev"].sum().reset_index()
    ranks: dict[int, dict[int, int]] = {}
    for y, grp in grid.groupby("y", sort=True):
        dr = _doubled_ranks(grp["rev"].to_numpy(np.int64))
        ranks[int(y)] = dict(zip(grp["nk"].astype(int), (int(x) for x in dr)))
    rows = []
    for y in sorted(ranks):
        if y + 1 not in ranks:
            continue
        a, b = ranks[y], ranks[y + 1]
        common = sorted(set(a) & set(b))
        n = len(common)
        if n < 2:
            continue
        rx = [a[k] for k in common]
        ry = [b[k] for k in common]
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(u * v for u, v in zip(rx, ry))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        rho = float(n * sxy - sx * sy) / (
            np.sqrt(float(vx)) * np.sqrt(float(vy))
        )
        rows.append(
            (y, y + 1, n, int(np.floor(rho * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(
        rows, columns=["year_from", "year_to", "n_nations", "spearman_micro"]
    ).astype(np.int64)


ORACLES138["nation_rank_stability"] = """
WITH r AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS y,
         CAST(c.c_nationkey AS BIGINT) AS nk,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
m AS (SELECT y, rev, CAST(count(*) AS HUGEINT) AS c FROM r GROUP BY 1, 2),
rr AS (
  SELECT y, rev,
         2 * coalesce(sum(c) OVER (PARTITION BY y ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS dr
  FROM m
),
rk AS (SELECT r.y, r.nk, rr.dr FROM r JOIN rr ON r.y = rr.y AND r.rev = rr.rev),
p AS (
  SELECT a.y AS year_from, a.y + 1 AS year_to, a.dr AS rx, b.dr AS ry
  FROM rk a JOIN rk b ON b.y = a.y + 1 AND b.nk = a.nk
),
s AS (
  SELECT year_from, year_to,
         CAST(count(*) AS HUGEINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
  FROM p GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT CAST(year_from AS BIGINT) AS year_from,
       CAST(year_to AS BIGINT) AS year_to,
       CAST(n AS BIGINT) AS n_nations,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS spearman_micro
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""


# ---------------------------------------------------------------------------
# conv_depth_verbosity — average turn length as a function of turn index
# ---------------------------------------------------------------------------


def q_conv_depth_verbosity(sf_dir: str):
    """Per turn index across all conversations: how many conversations reach
    that depth, the exact total text length in Unicode codepoints, and the
    average length in micro units (floor-half-up; ONE double division over
    exact int64 sums). The context-bloat diagnostic for transcript curation.

    Scale shape: per-batch (turn_idx, n, chars) combiner — the partials are
    the bounded max-conversation-depth grid — folded on the driver; no
    shuffle."""
    import pyarrow.compute as pc

    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame(
                {
                    "turn_idx": t["turn_idx"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "chars": chars.astype(np.int64),
                    "n": 1,
                }
            )
            .groupby("turn_idx", sort=False)
            .agg(n=("n", "sum"), chars=("chars", "sum"))
            .reset_index()
        )
        return g.astype({"n": np.int64, "chars": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "turn_idx": pd.Series([], dtype=np.int64),
            "n_turns": pd.Series([], dtype=np.int64),
            "sum_chars": pd.Series([], dtype=np.int64),
            "avg_chars_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("turn_idx", sort=True)
        .agg(n_turns=("n", "sum"), sum_chars=("chars", "sum"))
        .reset_index()
    )
    out["avg_chars_micro"] = np.floor(
        out["sum_chars"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(
        {"turn_idx": np.int64, "n_turns": np.int64, "sum_chars": np.int64}
    )


def _depth_verbosity_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """
SELECT CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(floor(CAST(sum(length(text)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS avg_chars_micro
FROM transcripts GROUP BY 1"""
    )


ORACLES138["conv_depth_verbosity"] = _depth_verbosity_oracle()


QUERIES138 = {
    "nation_rank_stability": q_nation_rank_stability,
    "conv_depth_verbosity": q_conv_depth_verbosity,
}
