"""Driver-contract queries, wave 298 — tool-chaining adjacency per
conversation (tool-output turns immediately continued by the assistant
on the SAME tool) and the quadrant-count lag-1 autocorrelation of the
daily series (the nonparametric lag-plot sign statistic). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES298: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_tool_chaining — tool output continued by the assistant
# ---------------------------------------------------------------------------


def q_conv_tool_chaining(sf_dir: str):
    """Tool chaining: a tool-role turn whose IMMEDIATE next turn
    (turn_idx + 1) is an assistant turn invoking the SAME tool — the
    assistant kept driving the tool after seeing its output. Per
    conversation with at least one tool-role turn: conv_id,
    n_tool_turns, n_chained, rate_micro. Pure integer counting.

    Scale shape: ONE conv-bucket exchange; per-bucket vectorized sort +
    shifted masks (the sessionize idiom)."""
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
                "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                "tool": np.asarray(t["tool"].to_numpy(zero_copy_only=False)),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_tool_turns": pd.Series([], dtype=np.int64),
                "n_chained": pd.Series([], dtype=np.int64),
                "rate_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty_m
        g = g.sort_values(["conv", "turn"], kind="stable")
        conv = g["conv"].to_numpy(object)
        turn = g["turn"].to_numpy(np.int64)
        role = g["role"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        tt = (role == "tool") & (tool != "")
        nxt_same = np.zeros(len(g), bool)
        nxt_same[:-1] = (conv[1:] == conv[:-1]) & (turn[1:] == turn[:-1] + 1)
        chained = np.zeros(len(g), bool)
        chained[:-1] = (
            tt[:-1]
            & nxt_same[:-1]
            & (role[1:] == "assistant")
            & (tool[1:] == tool[:-1])
        )
        df = pd.DataFrame(
            {"conv": conv, "tt": tt.astype(np.int64),
             "cl": chained.astype(np.int64)}
        )
        agg = df.groupby("conv", sort=False).agg(
            n_tool_turns=("tt", "sum"), n_chained=("cl", "sum")
        )
        agg = agg[agg["n_tool_turns"] > 0].reset_index()
        if len(agg) == 0:
            return empty_m
        agg = agg.rename(columns={"conv": "conv_id"})
        agg["rate_micro"] = np.floor(
            agg["n_chained"].to_numpy(np.float64)
            / agg["n_tool_turns"].to_numpy(np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        return agg.astype(
            {c: np.int64 for c in
             ("n_tool_turns", "n_chained", "rate_micro")}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _tool_chaining_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
seq AS (
  SELECT conv_id, turn_idx, role, tool,
         lead(turn_idx) OVER w AS nt,
         lead(role) OVER w AS nrole,
         lead(tool) OVER w AS ntool
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
agg AS (
  SELECT conv_id,
         CAST(sum(CASE WHEN role = 'tool' AND tool <> '' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tool_turns,
         CAST(sum(CASE WHEN role = 'tool' AND tool <> ''
                        AND nt = turn_idx + 1 AND nrole = 'assistant'
                        AND ntool = tool
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_chained
  FROM seq GROUP BY 1
)
SELECT conv_id, n_tool_turns, n_chained,
       CAST(floor(CAST(n_chained AS DOUBLE)
                  / CAST(n_tool_turns AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS rate_micro
FROM agg
WHERE n_tool_turns > 0"""
    )


# ---------------------------------------------------------------------------
# events_quadrant_autocorr — lag-plot quadrant-count statistic
# ---------------------------------------------------------------------------


def q_events_quadrant_autocorr(sf_dir: str):
    """Quadrant-count lag-1 statistic: with m = lower median of the
    zero-filled daily series, classify each (y_t, y_{t+1}) pair by
    quadrant (points ON the median dropped);
    qcr = (n11 + n00 - n10 - n01) / m_pairs — the robust sign version
    of lag-1 autocorrelation. Pure integer counting, one division. One
    row: n_days, med, n00, n01, n10, n11, qcr_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )
    from sts_opentelemetry_collector_ray.pipelines.queries265 import (
        _lower_median,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "med", "n00", "n01", "n10", "n11", "qcr_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 3:
        return empty
    med = _lower_median(y)
    a, b = y[:-1], y[1:]
    keep = (a != med) & (b != med)
    ah = a[keep] > med
    bh = b[keep] > med
    n11 = int((ah & bh).sum())
    n00 = int((~ah & ~bh).sum())
    n10 = int((ah & ~bh).sum())
    n01 = int((~ah & bh).sum())
    m = n00 + n01 + n10 + n11
    if m == 0:
        return empty
    qcr = float(n11 + n00 - n10 - n01) / float(m)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(med), np.int64(n00), np.int64(n01),
                np.int64(n10), np.int64(n11),
                np.int64(np.floor(qcr * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES298["events_quadrant_autocorr"] = """
WITH h AS (
  SELECT epoch_us(ts) // 86400000000 AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
med AS (
  SELECT min(y) AS m FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum >= (nn.n + 1) // 2
),
pairs AS (
  SELECT x.y AS a, lead(x.y) OVER (ORDER BY x.t) AS b FROM x
),
q AS (
  SELECT CAST(a > med.m AS INT) AS ah, CAST(b > med.m AS INT) AS bh
  FROM pairs, med
  WHERE b IS NOT NULL AND a <> med.m AND b <> med.m
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN ah = 0 AND bh = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n00,
    CAST(sum(CASE WHEN ah = 0 AND bh = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n01,
    CAST(sum(CASE WHEN ah = 1 AND bh = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n10,
    CAST(sum(CASE WHEN ah = 1 AND bh = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n11
  FROM q
)
SELECT nn.n AS n_days, med.m AS med, cnt.n00, cnt.n01, cnt.n10, cnt.n11,
       CAST(floor(CAST(cnt.n11 + cnt.n00 - cnt.n10 - cnt.n01 AS DOUBLE)
                  / CAST(cnt.n00 + cnt.n01 + cnt.n10 + cnt.n11 AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS qcr_micro
FROM nn, med, cnt
WHERE cnt.n00 + cnt.n01 + cnt.n10 + cnt.n11 > 0 AND nn.n >= 3"""


def _register_dynamic() -> None:
    ORACLES298["conv_tool_chaining"] = _tool_chaining_oracle()


_register_dynamic()

QUERIES298 = {
    "conv_tool_chaining": q_conv_tool_chaining,
    "events_quadrant_autocorr": q_events_quadrant_autocorr,
}
