"""Driver-contract queries, wave 114 — tool memoization hit rate (how many
tool calls repeat an argument already used in the SAME conversation: the
cache-worthiness readout for agent gateways) and daily-count max drawdown
(the peak-to-trough collapse metric, ported from finance to traffic
monitoring). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES114: dict[str, str] = {}

_MEMO_BUCKETS = 32
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# tools_memo_hit_rate — repeated (conv, tool, arg) call share
# ---------------------------------------------------------------------------


def q_tools_memo_hit_rate(sf_dir: str):
    """Memoization potential: per tool, a call is a HIT when its (conv,
    arg) pair already occurred earlier in that conversation — the count is
    order-free (hits = calls − distinct triples), so no sequencing is
    needed. hit_bp is exact basis points.

    Scale shape: per-batch distinct (conv, tool, arg) partials with
    per-batch call counts → ONE triple-hash bucket exchange (args are
    unbounded) → per-bucket exact distinct + call sums fold to bounded
    |tools| rows per bucket."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        tool = np.asarray(t["tool_name"].to_numpy(zero_copy_only=False))
        arg = np.asarray(t["call_arg"].to_numpy(zero_copy_only=False))
        m = pd.notna(tool) & pd.notna(arg)
        df = pd.DataFrame({"conv": conv[m], "tool": tool[m], "arg": arg[m]})
        g = (
            df.groupby(["conv", "tool", "arg"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        key = (g["conv"] + "\x1f" + g["tool"] + "\x1f" + g["arg"]).to_numpy(object)
        g["_b"] = (fnv1a64_array(key) % np.uint64(_MEMO_BUCKETS)).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["conv", "tool", "arg"], sort=False)["n"].sum().reset_index()
        out = m.groupby("tool", sort=False)["n"].agg(calls="sum", nd="size").reset_index()
        return out.astype({"calls": np.int64, "nd": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |tools| per bucket
    )
    g = part.groupby("tool")[["calls", "nd"]].sum().sort_index().reset_index()
    calls = g["calls"].to_numpy(np.int64)
    nd = g["nd"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "tool": g["tool"].to_numpy(object),
            "n_calls": calls,
            "n_hits": calls - nd,
            "hit_bp": (calls - nd) * 10_000 // np.maximum(calls, 1),
        }
    )


def _memo_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, calls AS (
  SELECT conv_id, tool_name AS tool, call_arg AS arg
  FROM parsed WHERE tool_name IS NOT NULL AND call_arg IS NOT NULL
)
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(*) - count(DISTINCT (conv_id, arg)) AS BIGINT) AS n_hits,
       CAST((count(*) - count(DISTINCT (conv_id, arg))) * 10000
            // greatest(count(*), 1) AS BIGINT) AS hit_bp
FROM calls GROUP BY 1"""
    )


ORACLES114["tools_memo_hit_rate"] = _memo_oracle()


# ---------------------------------------------------------------------------
# events_drawdown — peak-to-trough collapse of daily counts per type
# ---------------------------------------------------------------------------


def q_events_drawdown(sf_dir: str):
    """Max drawdown per event type over OBSERVED days (days with zero
    events carry no observation by contract): running peak minus current
    daily count, maximized; the reported trough is the EARLIEST day
    attaining it. Pure integers.

    Scale shape: per-batch (type, day, n) combiner partials fold
    driver-side over the bounded day grid; one maximum-accumulate per
    type."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        day = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        g = (
            pd.DataFrame({"event_type": et, "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| × |days| per block
        .groupby(["event_type", "day"])["n"]
        .sum()
    )
    rows = []
    for ty in sorted(part.index.get_level_values(0).unique()):
        h = part.xs(ty).sort_index()
        days = h.index.to_numpy(np.int64)
        cnt = h.to_numpy(np.int64)
        runmax = np.maximum.accumulate(cnt)
        dd = runmax - cnt
        i = int(np.argmax(dd))  # first maximal trough
        rows.append(
            {
                "event_type": ty,
                "max_drawdown": int(dd[i]),
                "trough_day": int(days[i]),
                "peak_count": int(runmax[i]),
            }
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "max_drawdown", "trough_day", "peak_count"]
    )
    return out.astype(
        {"max_drawdown": np.int64, "trough_day": np.int64, "peak_count": np.int64}
    )


ORACLES114["events_drawdown"] = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, n,
         max(n) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS runmax
  FROM d
)
SELECT event_type,
       CAST(runmax - n AS BIGINT) AS max_drawdown,
       CAST(day AS BIGINT) AS trough_day,
       CAST(runmax AS BIGINT) AS peak_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY runmax - n DESC, day) AS rr
  FROM r
) WHERE rr = 1"""


QUERIES114 = {
    "tools_memo_hit_rate": q_tools_memo_hit_rate,
    "events_drawdown": q_events_drawdown,
}
