"""Driver-contract queries, wave 125 — context growth rate (per-conversation
least-squares slope of cumulative prompt characters vs turn index: the
agent-cost driver — how fast a conversation's context window fills) and tool
retry rate (tool turns immediately re-invoked with the same tool: the
flaky-tool diagnostic). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES125: dict[str, str] = {}

_CG_BUCKETS = 32


def _conv_bucket_partial(t: pa.Table, extra: tuple[str, ...]) -> pd.DataFrame:
    """Shared partial: project (conv, turn, extras) + conv-hash bucket."""
    from ..functions.hashing import fnv1a64_array

    conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
    cols = {
        "conv": conv,
        "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
    }
    for name in extra:
        cols[name] = np.asarray(t[name].to_numpy(zero_copy_only=False))
    df = pd.DataFrame(cols)
    df["_b"] = (
        fnv1a64_array(conv.astype(object)) % np.uint64(_CG_BUCKETS)
    ).astype(np.int64)
    return df


# ---------------------------------------------------------------------------
# conv_context_growth — cumulative-context least-squares slope per conversation
# ---------------------------------------------------------------------------


def q_conv_context_growth(sf_dir: str):
    """Context growth: y(turn) = cumulative UTF-8 chars of all turn text up to
    and including that turn; the per-conversation OLS slope of y on turn_idx
    is chars-per-turn context growth. The five regression sums (n, Σx, Σy,
    Σxy, Σx²) accumulate as EXACT int64 — slope is one double division on
    both sides, so the floor-half-up micro value is bit-identical to the SQL.

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange; inside a bucket the cumsum + regression sums are
    np.add.reduceat kernels over conv boundaries — one output row per
    conversation, no per-row Python."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage

    import pyarrow.compute as pc

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ())
        df["len"] = (
            pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        x = g["turn"].to_numpy(np.int64)
        lens = g["len"].to_numpy(np.int64)
        n = len(g)
        new = np.r_[True, conv[1:] != conv[:-1]]
        starts = np.flatnonzero(new)
        # per-conv cumulative chars: global cumsum minus the value just before
        # each conversation start
        cum = np.cumsum(lens)
        base = np.zeros(n, np.int64)
        base[starts[1:]] = cum[starts[1:] - 1]
        y = cum - np.maximum.accumulate(base)
        cnt = np.diff(np.r_[starts, n]).astype(np.int64)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxy = np.add.reduceat(x * y, starts)
        sxx = np.add.reduceat(x * x, starts)
        keep = cnt >= 2
        num = (cnt * sxy - sx * sy).astype(np.float64)
        den = (cnt * sxx - sx * sx).astype(np.float64)
        slope = np.divide(num, den, out=np.zeros_like(num), where=den != 0)
        return pd.DataFrame(
            {
                "conv_id": conv[starts[keep]],
                "n_turns": cnt[keep],
                "slope_micro": np.floor(slope[keep] * 1_000_000.0 + 0.5).astype(
                    np.int64
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one row per conversation
    )
    if out.empty or "conv_id" not in out.columns:
        # every conversation single-turn: Ray's empty blocks are schema-less
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "slope_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = out.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    out["n_turns"] = out["n_turns"].astype(np.int64)
    out["slope_micro"] = out["slope_micro"].astype(np.int64)
    return out


def _context_growth_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, cum AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS x,
         CAST(SUM(length(text)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
         ) AS BIGINT) AS y
  FROM parsed
),
s AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM cum GROUP BY 1
)
SELECT conv_id, n AS n_turns,
       CAST(floor(
         (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
         * 1000000.0 + 0.5
       ) AS BIGINT) AS slope_micro
FROM s WHERE n >= 2"""
    )


ORACLES125["conv_context_growth"] = _context_growth_oracle()


# ---------------------------------------------------------------------------
# tools_retry_rate — immediate same-tool re-invocations per tool
# ---------------------------------------------------------------------------


def q_tools_retry_rate(sf_dir: str):
    """Tool retry diagnostic: a RETRY is a tool turn whose immediately-next
    turn in the same conversation is another tool turn invoking the SAME
    tool. Per tool: call count, retry count, and retry share in micro units
    (floor-half-up, one double division).

    Scale shape: the same conv-bucket exchange; shifted-array comparisons
    inside each bucket produce bounded (tool, n, retries) partials that fold
    on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role", "tool"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        is_call = (role == "tool") & (tool != "")
        same_conv = np.r_[conv[1:] == conv[:-1], False]
        next_is_call = np.r_[is_call[1:], False]
        next_same_tool = np.r_[tool[1:] == tool[:-1], False]
        retry = is_call & same_conv & next_is_call & next_same_tool
        h = (
            pd.DataFrame({"tool": tool[is_call], "retry": retry[is_call]})
            .groupby("tool", sort=False)
            .agg(n_calls=("retry", "size"), n_retries=("retry", "sum"))
            .reset_index()
        )
        return h.astype({"n_calls": np.int64, "n_retries": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |tools| rows per bucket
    )
    if part.empty or "tool" not in part.columns:
        # no tool calls anywhere: Ray's empty blocks are schema-less
        return pd.DataFrame(
            {
                "tool": pd.Series([], dtype=object),
                "n_calls": pd.Series([], dtype=np.int64),
                "n_retries": pd.Series([], dtype=np.int64),
                "retry_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby("tool", sort=True)[["n_calls", "n_retries"]]
        .sum()
        .reset_index()
    )
    out["retry_micro"] = np.floor(
        out["n_retries"].to_numpy(np.float64)
        / out["n_calls"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    for c in ("n_calls", "n_retries"):
        out[c] = out[c].astype(np.int64)
    return out[["tool", "n_calls", "n_retries", "retry_micro"]]


def _retry_rate_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, seq AS (
  SELECT tool, role,
         (role = 'tool' AND tool <> '') AS is_call,
         lead(role) OVER w AS nrole,
         lead(tool) OVER w AS ntool
  FROM parsed
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
f AS (
  SELECT tool,
         CASE WHEN nrole = 'tool' AND ntool = tool THEN 1 ELSE 0 END AS retry
  FROM seq WHERE is_call
),
a AS (
  SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
         CAST(sum(retry) AS BIGINT) AS n_retries
  FROM f GROUP BY 1
)
SELECT tool, n_calls, n_retries,
       CAST(floor(CAST(n_retries AS DOUBLE) / CAST(n_calls AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS retry_micro
FROM a"""
    )


ORACLES125["tools_retry_rate"] = _retry_rate_oracle()


QUERIES125 = {
    "conv_context_growth": q_conv_context_growth,
    "tools_retry_rate": q_tools_retry_rate,
}
