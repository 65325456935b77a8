"""Driver-contract queries, wave 400 — the tail-sampling processor's two
remaining policies, batch-translated: span_count (batch-EXACT per-trace span
count band) and rate_limiting (event-time per-second trace admission —
deterministic translation of the processor's arrival-order semantics;
stages/tailsampling.py). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

ORACLES400: dict[str, str] = {}

_RL_BUDGET = 70  # spans/second event-time budget (sf0.01: per-sec sums 56-121)
_SC_MIN, _SC_MAX = 75, 85

_OUT_COLS = ["conv_id", "turn_idx", "role", "tool", "severity", "ts"]


def q_tail_sample_spancount(sf_dir: str):
    """span_count tail-sampling policy (min_spans/max_spans band), composed
    after a probabilistic policy so both vote paths and first-win attribution
    are exercised (stages/tailsampling.py::SpanCountPolicy — batch-exact)."""
    from ..stages.tailsampling import ProbabilisticPolicy, SpanCountPolicy, tail_sample
    from .queries2 import _parsed_transcripts

    policies = [
        ProbabilisticPolicy("prob", pct=10),
        SpanCountPolicy("band", min_spans=_SC_MIN, max_spans=_SC_MAX),
    ]
    out = tail_sample(_parsed_transcripts(sf_dir), policies)
    return out.select_columns(_OUT_COLS + ["sampled_by"])


def q_rate_limit_sample(sf_dir: str):
    """Event-time rate limiting: traces admitted per event-time second in
    (start_ts, conv_id) order until the second's span budget is spent —
    whole-trace keep/drop (stages/tailsampling.py::rate_limit_sample)."""
    from ..stages.tailsampling import rate_limit_sample
    from .queries2 import _parsed_transcripts

    out = rate_limit_sample(_parsed_transcripts(sf_dir), spans_per_second=_RL_BUDGET)
    return out.select_columns(_OUT_COLS)


def _oracles() -> dict[str, str]:
    from .queries2 import _PARSED_SQL, _fnv_mod

    sc = (
        _PARSED_SQL
        + f""",
stats AS (
  SELECT conv_id, count(*) AS n, {_fnv_mod("conv_id", 100)} AS h
  FROM parsed GROUP BY conv_id
),
dec AS (
  SELECT conv_id,
         CASE WHEN h < 10 THEN 'prob'
              WHEN n BETWEEN {_SC_MIN} AND {_SC_MAX} THEN 'band'
              ELSE NULL END AS sampled_by
  FROM stats
)
SELECT p.conv_id, p.turn_idx, p.role, p.tool, p.severity, p.ts, d.sampled_by
FROM parsed p JOIN dec d USING (conv_id)
WHERE d.sampled_by IS NOT NULL"""
    )
    rl = (
        _PARSED_SQL
        + f""",
tr AS (SELECT conv_id, count(*) AS n, min(epoch_us(ts)) AS start_us
       FROM parsed GROUP BY conv_id),
sec AS (SELECT conv_id, n, start_us, start_us // 1000000 AS sec FROM tr),
adm AS (
  SELECT conv_id,
         sum(n) OVER (PARTITION BY sec ORDER BY start_us, conv_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sec
),
keep AS (SELECT conv_id FROM adm WHERE cum <= {_RL_BUDGET})
SELECT p.conv_id, p.turn_idx, p.role, p.tool, p.severity, p.ts
FROM parsed p JOIN keep USING (conv_id)"""
    )
    return {"tail_sample_spancount": sc, "rate_limit_sample": rl}


def dynamic_oracles400() -> dict[str, str]:
    return _oracles()


QUERIES400 = {
    "tail_sample_spancount": q_tail_sample_spancount,
    "rate_limit_sample": q_rate_limit_sample,
}
