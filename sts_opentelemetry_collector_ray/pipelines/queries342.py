"""Driver-contract queries, wave 342 — extreme-day timing (which
weekdays the top-decile days land on, vs uniform) and tool density by
conversation outcome (do error-bearing conversations call more tools
per turn?). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES342: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_extreme_day_timing — weekday mix of the top-decile days
# ---------------------------------------------------------------------------


def q_events_extreme_day_timing(sf_dir: str):
    """Timing of extremes: days with counts ABOVE the exact P90 order
    statistic (k = ceil(0.9 n)) get a weekday census, with the
    chi-square against the uniform 1/7 reference. Pure integer
    counting. Per dow: dow, n_extreme, share_micro, chi2_micro
    (repeated)."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["dow", "n_extreme", "share_micro", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 14:
        return empty
    d0 = int(days.index.min())
    k = (9 * n + 9) // 10
    thr = int(np.sort(y)[k - 1])
    dow = (d0 + np.arange(n)) % 7
    ext = y > thr
    m = int(ext.sum())
    if m == 0:
        return empty
    counts = np.array(
        [int((ext & (dow == w)).sum()) for w in range(7)], np.int64
    )
    e = float(m) / 7.0
    chi2 = float((((counts.astype(np.float64) - e) ** 2) / e).sum())
    cm = np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (
                np.int64(w), np.int64(counts[w]),
                np.int64(np.floor(
                    float(counts[w]) / float(m) * 1_000_000.0 + 0.5
                )),
                cm,
            )
            for w in range(7)
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES342["events_extreme_day_timing"] = f"""
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
  SELECT grid.dy % 7 AS dow, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
thr AS (
  SELECT min(y) AS t FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum * 10 >= 9 * nn.n + 9 - ((9 * nn.n + 9) % 10)
),
ext AS (SELECT x.dow FROM x, thr WHERE x.y > thr.t),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ext),
dows AS (SELECT CAST(r.range AS BIGINT) AS dow FROM range(0, 7) r),
cnt AS (
  SELECT dows.dow,
         CAST(coalesce(sum(CASE WHEN ext.dow = dows.dow THEN 1 END), 0)
              AS BIGINT) AS c
  FROM dows LEFT JOIN ext ON ext.dow = dows.dow
  GROUP BY 1
),
chi AS (
  SELECT sum((CAST(c AS DOUBLE) - CAST(mm.m AS DOUBLE) / 7.0)
             * (CAST(c AS DOUBLE) - CAST(mm.m AS DOUBLE) / 7.0)
             / (CAST(mm.m AS DOUBLE) / 7.0)) AS chi2
  FROM cnt, mm WHERE mm.m > 0
)
SELECT cnt.dow, cnt.c AS n_extreme,
       CAST(floor(CAST(cnt.c AS DOUBLE) / mm.m * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM cnt, mm, chi, nn
WHERE mm.m > 0 AND nn.n >= 14
ORDER BY cnt.dow"""


# ---------------------------------------------------------------------------
# conv_tool_density_by_outcome — tool calls per turn, clean vs error convs
# ---------------------------------------------------------------------------


def q_conv_tool_density_by_outcome(sf_dir: str):
    """Tooling under stress: split conversations by whether ANY turn
    carries '[ERROR]'; per class count turns and tool-bearing turns
    (tool <> ''). Pure integer counting. Per class: has_error, n_convs,
    n_turns, n_tool_turns, density_micro.

    Scale shape: ONE conv-bucket exchange; per-bucket vectorized
    any-error + tool masks."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "err": pc.match_substring(t["text"], "[ERROR]").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
                "tool": (
                    np.asarray(t["tool"].to_numpy(zero_copy_only=False))
                    != ""
                ).astype(np.int64),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64)
             for c in ("he", "nc", "nt", "ntool")}
        )
        if len(g) == 0:
            return zero
        per = g.groupby("conv").agg(
            err=("err", "max"), nt=("err", "size"), ntool=("tool", "sum")
        )
        agg = per.groupby("err").agg(
            nc=("nt", "size"), nt=("nt", "sum"), ntool=("ntool", "sum")
        )
        out = agg.reset_index().rename(columns={"err": "he"})
        return out.astype(np.int64)

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("he")[["nc", "nt", "ntool"]]
        .sum()
        .sort_index()
    )
    cols = ["has_error", "n_convs", "n_turns", "n_tool_turns",
            "density_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"he": "has_error", "nc": "n_convs", "nt": "n_turns",
                 "ntool": "n_tool_turns"}
    )
    out["density_micro"] = np.floor(
        out["n_tool_turns"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


def _tool_density_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
per AS (
  SELECT conv_id,
         CAST(max(CAST(contains(text, '[ERROR]') AS INT)) AS BIGINT)
           AS has_error,
         CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS ntool
  FROM transcripts GROUP BY 1
),
agg AS (
  SELECT has_error, CAST(count(*) AS BIGINT) AS n_convs,
         CAST(sum(nt) AS BIGINT) AS n_turns,
         CAST(sum(ntool) AS BIGINT) AS n_tool_turns
  FROM per GROUP BY 1
)
SELECT has_error, n_convs, n_turns, n_tool_turns,
       CAST(floor(CAST(n_tool_turns AS DOUBLE) / CAST(n_turns AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS density_micro
FROM agg
ORDER BY has_error"""
    )


def _register_dynamic() -> None:
    ORACLES342["conv_tool_density_by_outcome"] = _tool_density_oracle()


_register_dynamic()

QUERIES342 = {
    "events_extreme_day_timing": q_events_extreme_day_timing,
    "conv_tool_density_by_outcome": q_conv_tool_density_by_outcome,
}
