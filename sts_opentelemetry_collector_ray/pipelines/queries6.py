"""Driver-contract queries, wave 6 — deterministic uniform sampling, cohort
retention analysis, per-key z-score anomaly flags, and text canonicalization.
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES6: dict[str, str] = {}


def _fnv32_sql(expr: str) -> str:
    """FNV-1a32 of an expression's VARCHAR form (functions/hashing.py replay)."""
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split(CAST({expr} AS VARCHAR), ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
    )


# ---------------------------------------------------------------------------
# events_uniform_sample — deterministic reservoir-equivalent k-sample
# ---------------------------------------------------------------------------

_SAMPLE_K = 200


def q_events_uniform_sample(sf_dir: str):
    """200 events sampled uniformly by id-hash rank (stages/analytics.py::
    uniform_sample_k — per-batch top-k combiner keeps the exchange at
    k·|blocks| rows; no RNG state, rerun-stable at any scale)."""
    from ..stages.analytics import uniform_sample_k

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    return uniform_sample_k(
        ds, "event_id", _SAMPLE_K, keep_cols=["event_id", "user_id", "event_type"]
    )


ORACLES6["events_uniform_sample"] = f"""
SELECT event_id, user_id, event_type, {_fnv32_sql("event_id")} AS h
FROM events ORDER BY h, event_id LIMIT {_SAMPLE_K}"""


# ---------------------------------------------------------------------------
# events_cohort_retention — first-seen cohort × activity-offset matrix
# ---------------------------------------------------------------------------


def q_events_cohort_retention(sf_dir: str):
    """Users active offset days after their first-seen day
    (stages/analytics.py::cohort_retention — distinct-(user,day) combiner, ONE
    user-bucket exchange so the in-bucket min is the global cohort, tiny
    (cohort, offset) sum)."""
    from ..stages.analytics import cohort_retention

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return cohort_retention(ds)


ORACLES6["events_cohort_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) AS day_us FROM events
),
c AS (SELECT user_id, min(day_us) AS cohort_day_us FROM ud GROUP BY 1)
SELECT c.cohort_day_us,
       (ud.day_us - c.cohort_day_us) // 86400000000 AS offset_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN c USING (user_id) GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# events_zscore — per-type anomaly flags from exact integer moments
# ---------------------------------------------------------------------------


def q_events_zscore(sf_dir: str):
    """|z| > 2 anomaly flags per event_type (stages/analytics.py::zscore_flags
    — exact integer-cent moment combiner → |keys| driver merge → broadcast
    (μ, σ) → streaming flag pass; fixed-order float math so the SQL replay is
    bit-exact)."""
    from ..stages.analytics import zscore_flags

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return zscore_flags(ds, "event_type", sigma=2.0)


ORACLES6["events_zscore"] = """
WITH b AS (
  SELECT event_id, event_type, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(cents * cents) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1
),
st AS (
  SELECT event_type, s::DOUBLE / n AS mu,
         (q::DOUBLE - (s::DOUBLE * s::DOUBLE) / n) / n AS var
  FROM m
),
sd AS (
  SELECT event_type, mu,
         CASE WHEN var > 0 THEN sqrt(var) ELSE 0.0 END AS sd
  FROM st
)
SELECT b.event_id, b.event_type, b.value,
       CASE WHEN sd.sd > 0
            THEN floor((b.cents::DOUBLE - sd.mu) / sd.sd * 1e6 + 0.5) / 1e6
       END AS zscore,
       CASE WHEN sd.sd > 0
            THEN abs(floor((b.cents::DOUBLE - sd.mu) / sd.sd * 1e6 + 0.5) / 1e6)
                 > 2.0
            ELSE false END AS is_anomaly
FROM b JOIN sd USING (event_type)"""


# ---------------------------------------------------------------------------
# docs_normalize — canonical text form for dedup keys
# ---------------------------------------------------------------------------


def q_docs_normalize(sf_dir: str):
    """Lowercase / strip-punct / collapse-space canonicalization
    (text_analysis.py::normalize_text_batch — Arrow RE2 kernels, zero
    shuffles)."""
    from ..stages.text_analysis import normalize_text_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow")


ORACLES6["docs_normalize"] = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
                                            '[^a-z0-9 ]+', ' ', 'g'),
                             ' +', ' ', 'g'), ' ') AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars FROM n"""


QUERIES6 = {
    "events_uniform_sample": q_events_uniform_sample,
    "events_cohort_retention": q_events_cohort_retention,
    "events_zscore": q_events_zscore,
    "docs_normalize": q_docs_normalize,
}
