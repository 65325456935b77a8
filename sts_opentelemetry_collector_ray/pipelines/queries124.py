"""Driver-contract queries, wave 124 — temperature-resampling ESS sweep
(effective sample size of the source mixture at several sampling
temperatures: the how-flat-can-we-go diagnostic before a mixture rebalance)
and tool response latency (per tool, the gap from a tool turn to the
conversation's next turn — the agent-tooling latency attribution). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES124: dict[str, str] = {}

_ESS_TEMPS = ("0.5", "0.7", "1.0")  # string literals shared with the SQL
_TL_BUCKETS = 32


# ---------------------------------------------------------------------------
# docs_temperature_ess — effective sample size across sampling temperatures
# ---------------------------------------------------------------------------


def q_docs_temperature_ess(sf_dir: str):
    """Mixture flattening: at temperature T the source weights are
    w_s ∝ share_s^(1/T); the effective sample size over sources is
    ESS = (Σw)²/Σw² (1 = one source dominates, |sources| = uniform).
    Weights evaluate as ONE fixed power expression per source and the sums
    accumulate in source order (the users_entropy technique); released
    floor-half-up at 1e-6.

    Scale shape: per-batch (source, n) combiner partials — |sources| rows
    per block — fold on the driver; the sweep is |T|×|sources| scalar
    math."""

    def partial(t: pa.Table) -> pd.DataFrame:
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False))
        uu, cc = np.unique(src, return_counts=True)
        return pd.DataFrame({"source": uu.astype(object), "n": cc.astype(np.int64)})

    part = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source")["n"]
        .sum()
        .sort_index()
    )
    total = int(part.sum())
    rows = []
    for t_str in _ESS_TEMPS:
        t_val = float(t_str)
        sw = 0.0
        sw2 = 0.0
        for s in part.index:  # fixed source order → fixed accumulation
            share = int(part[s]) / total
            w = share ** (1.0 / t_val)
            sw = sw + w
            sw2 = sw2 + w * w
        ess = (sw * sw) / sw2
        rows.append(
            {
                "temperature": t_str,
                "n_sources": len(part),
                "ess_micro": int(np.floor(ess * 1_000_000.0 + 0.5)),
            }
        )
    out = pd.DataFrame(rows, columns=["temperature", "n_sources", "ess_micro"])
    return out.astype({"n_sources": np.int64, "ess_micro": np.int64})


ORACLES124["docs_temperature_ess"] = f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM s),
temps(temperature) AS (VALUES {", ".join(f"('{t}')" for t in _ESS_TEMPS)}),
w AS (
  SELECT temps.temperature, s.source,
         power(CAST(s.n AS DOUBLE) / CAST(tot.t AS DOUBLE),
               1.0 / CAST(temps.temperature AS DOUBLE)) AS w
  FROM s, tot, temps
),
agg AS (
  SELECT temperature,
         CAST(count(*) AS BIGINT) AS n_sources,
         list_sum(list(w ORDER BY source)) AS sw,
         list_sum(list(w * w ORDER BY source)) AS sw2
  FROM w GROUP BY temperature
)
SELECT temperature, n_sources,
       CAST(floor((sw * sw) / sw2 * 1000000.0 + 0.5) AS BIGINT) AS ess_micro
FROM agg"""


# ---------------------------------------------------------------------------
# tools_response_latency — tool-turn → next-turn gap percentiles per tool
# ---------------------------------------------------------------------------


def q_tools_response_latency(sf_dir: str):
    """Tool latency attribution: for every tool turn that has a NEXT turn
    in its conversation, the gap in whole seconds to that next turn;
    reported per tool as exact integer p50/p90 (lower ranks: ceil(q·n)-th
    smallest) and max.

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange; per-bucket lexsort + shifted diffs produce
    bounded (tool, seconds) histogram partials; integer rank picks on the
    driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                "tool": np.asarray(t["tool"].to_numpy(zero_copy_only=False)),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(_TL_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        ts = g["ts"].to_numpy(np.int64)
        role = g["role"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        has_next = np.r_[conv[1:] == conv[:-1], False]
        is_tool = (role == "tool") & (tool != "") & has_next
        gap = np.zeros(len(g), np.int64)
        gap[:-1] = (ts[1:] - ts[:-1]) // 1_000_000
        h = (
            pd.DataFrame({"tool": tool[is_tool], "sec": gap[is_tool]})
            .groupby(["tool", "sec"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        h["n"] = h["n"].astype(np.int64)
        return h

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: (tool, seconds) histogram rows
    )
    rows = []
    if not part.empty and "tool" in part.columns:
        hist = part.groupby(["tool", "sec"])["n"].sum()
        for tool in sorted(hist.index.get_level_values(0).unique()):
            h = hist.xs(tool).sort_index()
            secs = h.index.to_numpy(np.int64)
            cnt = h.to_numpy(np.int64)
            n = int(cnt.sum())
            cum = np.cumsum(cnt)

            def pick(q_num: int, q_den: int) -> int:
                k = -(-q_num * n // q_den)  # ceil(q·n)
                return int(secs[np.searchsorted(cum, k)])

            rows.append(
                {
                    "tool": tool,
                    "n_calls": n,
                    "p50_sec": pick(1, 2),
                    "p90_sec": pick(9, 10),
                    "max_sec": int(secs[-1]),
                }
            )
    out = pd.DataFrame(
        rows, columns=["tool", "n_calls", "p50_sec", "p90_sec", "max_sec"]
    )
    for c in ("n_calls", "p50_sec", "p90_sec", "max_sec"):
        out[c] = out[c].astype(np.int64)
    return out


def _latency_oracle_exact() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, g AS (
  SELECT tool,
         (lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
          - epoch_us(ts)) // 1000000 AS sec,
         role
  FROM parsed
),
f AS (SELECT tool, CAST(sec AS BIGINT) AS sec
      FROM g WHERE role = 'tool' AND tool <> '' AND sec IS NOT NULL),
r AS (
  SELECT tool, sec,
         row_number() OVER (PARTITION BY tool ORDER BY sec) AS rn,
         count(*) OVER (PARTITION BY tool) AS n
  FROM f
)
SELECT tool,
       CAST(max(n) AS BIGINT) AS n_calls,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN sec END) AS BIGINT) AS p50_sec,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN sec END) AS BIGINT)
         AS p90_sec,
       CAST(max(sec) AS BIGINT) AS max_sec
FROM r GROUP BY tool"""
    )


ORACLES124["tools_response_latency"] = _latency_oracle_exact()


QUERIES124 = {
    "docs_temperature_ess": q_docs_temperature_ess,
    "tools_response_latency": q_tools_response_latency,
}
