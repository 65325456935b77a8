"""Driver-contract queries, wave 65 — Holt double-exponential forecast
(level + trend in exact fixed point; where the hourly series is heading) and
asymmetric shingle containment (the subset-copy detector Jaccard misses).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES65: dict[str, str] = {}

_H_SCALE = 1_000_000
_H_OFF = 10**15  # offset so SQL's truncating // behaves like Python's floor
_HOUR_US = 3_600_000_000
_H_HORIZON = 24
_CONT_DOCS = 200
_CONT_K = 5
_CONT_TAU_MICRO = 500_000  # containment >= 0.5


# ---------------------------------------------------------------------------
# events_holt_forecast — integer Holt level+trend, 24h-ahead forecast
# ---------------------------------------------------------------------------


def q_events_holt_forecast(sf_dir: str):
    """Holt's linear method per event type over the dense hourly series, in
    EXACT fixed point (α = 0.3, β = 0.2):
      l₀ = x₀·10⁶, b₀ = 0
      lₜ = ⌊(3·xₜ·10⁶ + 7·(lₜ₋₁ + bₜ₋₁)) / 10⌋
      bₜ = ⌊(2·(lₜ − lₜ₋₁) + 8·bₜ₋₁) / 10⌋
    floor division on possibly-NEGATIVE trend terms — replayed in SQL with
    the +OFF offset (DuckDB `//` truncates toward zero; Python floors).
    Reports the final level, trend, and the 24-hour-ahead forecast.

    Scale shape: same as events_ewma — one (type, hour) combiner, ONE tiny
    bounded exchange, per-type integer recurrence on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hr": hrs}
        )
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| x calendar-hour domain
        .groupby(["event_type", "hr"])["cnt"]
        .sum()
    )
    h0 = int(hist.index.get_level_values("hr").min())
    h1 = int(hist.index.get_level_values("hr").max())
    span = h1 - h0 + 1
    rows = []
    for et in sorted(hist.index.get_level_values("event_type").unique()):
        x = np.zeros(span, dtype=np.int64)
        sub = hist.loc[et]
        x[sub.index.to_numpy(np.int64) - h0] = sub.to_numpy(np.int64)
        l = int(x[0]) * _H_SCALE
        b = 0
        for v in x[1:]:
            l_new = (3 * int(v) * _H_SCALE + 7 * (l + b)) // 10
            b = (2 * (l_new - l) + 8 * b) // 10
            l = l_new
        rows.append((et, l, b, l + _H_HORIZON * b))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "level_fp6": np.array([r[1] for r in rows], np.int64),
            "trend_fp6": np.array([r[2] for r in rows], np.int64),
            "forecast_24h_fp6": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES65["events_holt_forecast"] = f"""
WITH RECURSIVE h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
types AS (SELECT DISTINCT event_type FROM h),
grid AS (
  SELECT t.event_type, g.h0 + CAST(r.range AS BIGINT) AS hr,
         CAST(r.range AS BIGINT) AS step
  FROM g CROSS JOIN range(0, 200000) r CROSS JOIN types t
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.event_type, grid.step,
         CAST(coalesce(h.cnt, 0) AS HUGEINT) AS cnt
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.hr = grid.hr
),
rec AS (
  SELECT event_type, step, cnt * {_H_SCALE} AS l, CAST(0 AS HUGEINT) AS b
  FROM x WHERE step = 0
  UNION ALL
  SELECT x.event_type, x.step,
         ((3 * x.cnt * {_H_SCALE} + 7 * (rec.l + rec.b) + 10 * {_H_OFF}) // 10)
           - {_H_OFF} AS l,
         ((2 * (((3 * x.cnt * {_H_SCALE} + 7 * (rec.l + rec.b)
                  + 10 * {_H_OFF}) // 10) - {_H_OFF} - rec.l)
           + 8 * rec.b + 10 * {_H_OFF}) // 10) - {_H_OFF} AS b
  FROM rec JOIN x ON x.event_type = rec.event_type AND x.step = rec.step + 1
)
SELECT rec.event_type,
       CAST(rec.l AS BIGINT) AS level_fp6,
       CAST(rec.b AS BIGINT) AS trend_fp6,
       CAST(rec.l + {_H_HORIZON} * rec.b AS BIGINT) AS forecast_24h_fp6
FROM rec
WHERE rec.step = (SELECT h1 - h0 FROM g)
ORDER BY rec.event_type"""


# ---------------------------------------------------------------------------
# docs_shingle_containment — asymmetric near-dup (subset-copy detector)
# ---------------------------------------------------------------------------


def q_docs_shingle_containment(sf_dir: str):
    """Asymmetric containment over distinct 5-char shingles:
    C(A→B) = |A∩B| / |A| — catches a short doc quoted inside a long one,
    which symmetric Jaccard dilutes away. Pairs (a < b) from the first 200
    docs where EITHER direction ≥ 0.5; micro values by integer division
    round-half-up. The labeled small-N exact baseline (same contract as
    docs_ngram_jaccard); the scale path is the MinHash band family.

    Shingle sets build vectorized (hash-free string sets per doc); the pair
    loop is over the bounded 200-doc slice."""

    import pyarrow.parquet as pq_mod
    import re

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .sort("doc_id")
        .limit(_CONT_DOCS)
        .to_pandas()
    )
    sets = {}
    for did, txt in zip(t["doc_id"], t["text"]):
        s = re.sub(r"\s+", " ", (txt or "").lower()).strip()
        if len(s) == 0:
            sets[int(did)] = frozenset()
        elif len(s) < _CONT_K:
            sets[int(did)] = frozenset([s])
        else:
            sets[int(did)] = frozenset(
                s[i : i + _CONT_K] for i in range(len(s) - _CONT_K + 1)
            )
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            cab = (2_000_000 * inter + len(sa)) // (2 * len(sa))
            cba = (2_000_000 * inter + len(sb)) // (2 * len(sb))
            if cab >= _CONT_TAU_MICRO or cba >= _CONT_TAU_MICRO:
                rows.append((a, b, cab, cba))
    return pd.DataFrame(
        {
            "a": np.array([r[0] for r in rows], np.int64),
            "b": np.array([r[1] for r in rows], np.int64),
            "cont_ab_micro": np.array([r[2] for r in rows], np.int64),
            "cont_ba_micro": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES65["docs_shingle_containment"] = f"""
WITH d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents ORDER BY doc_id LIMIT {_CONT_DOCS}),
d AS (SELECT doc_id,
        CASE WHEN length(s) = 0 THEN []::VARCHAR[]
             WHEN length(s) < {_CONT_K} THEN [s]
             ELSE list_distinct(list_transform(range(length(s) - {_CONT_K - 1}),
                                i -> substring(s, CAST(i AS INT) + 1, {_CONT_K})))
        END AS sh
      FROM d0),
p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(a.sh) > 0 AND len(b.sh) > 0)
SELECT a, b,
       (2000000 * inter + na) // (2 * na) AS cont_ab_micro,
       (2000000 * inter + nb) // (2 * nb) AS cont_ba_micro
FROM p
WHERE (2000000 * inter + na) // (2 * na) >= {_CONT_TAU_MICRO}
   OR (2000000 * inter + nb) // (2 * nb) >= {_CONT_TAU_MICRO}"""


QUERIES65 = {
    "events_holt_forecast": q_events_holt_forecast,
    "docs_shingle_containment": q_docs_shingle_containment,
}
