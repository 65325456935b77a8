"""Driver-contract queries, wave 258 — exact partial autocorrelation of the
daily event series (closed-form Durbin–Levinson / Yule–Walker at lags 1–3)
and sorted-neighborhood blocking (Hernández & Stolfo 1995), the classic
entity-resolution candidate generator missing from the dedup family.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES258: dict[str, str] = {}

_DAY_US = 86_400_000_000
_SN_KEY_LEN = 12
_SN_WINDOW = 4  # pairs with rank gap 1..3


# ---------------------------------------------------------------------------
# events_pacf — exact PACF of the zero-filled daily count series, lags 1–3
# ---------------------------------------------------------------------------


def q_events_pacf(sf_dir: str):
    """Partial autocorrelation of the dense (zero-filled) daily event-count
    series at lags 1–3, via the closed-form Yule–Walker solutions:
    φ11 = r1, φ22 = (r2−r1²)/(1−r1²), φ33 = det(T₃*)/det(T₃) with the
    Toeplitz determinants expanded as polynomials in r1,r2,r3. Each rₖ is
    ONE exact-integer division (the `events_acf` trick: scaled deviations
    dᵢ = n·xᵢ−S in arbitrary-precision ints / HUGEINT); φ22 is likewise one
    exact rational (numerator and denominator cleared of den); φ33's degree-3
    polynomial would overflow HUGEINT cleared, so both sides evaluate the
    SAME left-associative double expression over the exact rₖ — bit-equal
    by construction. One row: n_days, r1..r3_micro, pacf1..pacf3_micro.

    Scale shape: one (day → count) combiner per batch, ONE bounded exchange
    (calendar-day domain), the recursion on the driver over that series."""

    def partial(t: pa.Table) -> pa.Table:
        days = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(days).groupby(days).size()
        return pa.table(
            {
                "dy": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    days = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: calendar-day domain
        .groupby("dy")["cnt"]
        .sum()
    )
    cols = [
        "n_days", "r1_micro", "r2_micro", "r3_micro",
        "pacf1_micro", "pacf2_micro", "pacf3_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    d0, d1 = int(days.index.min()), int(days.index.max())
    x = np.zeros(d1 - d0 + 1, dtype=np.int64)
    x[days.index.to_numpy(np.int64) - d0] = days.to_numpy(np.int64)
    n = len(x)
    if n < 4:
        return empty
    S = int(x.sum())
    d = [int(n) * int(v) - S for v in x]  # exact ints
    den = sum(v * v for v in d)
    if den == 0:
        return empty
    num = [sum(a * b for a, b in zip(d[:-k], d[k:])) for k in (1, 2, 3)]
    r1 = float(num[0]) / float(den)
    r2 = float(num[1]) / float(den)
    r3 = float(num[2]) / float(den)
    # φ22 exact rational: (num2·den − num1²) / (den² − num1²)
    p2_num = num[1] * den - num[0] * num[0]
    p2_den = den * den - num[0] * num[0]
    pacf2 = float(p2_num) / float(p2_den) if p2_den != 0 else 0.0
    # φ33: identical left-associative double expression on both sides
    det_t = 1.0 - 2.0 * r1 * r1 - r2 * r2 + 2.0 * r1 * r1 * r2
    det_a = r3 - 2.0 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 * r1 * r1
    pacf3 = det_a / det_t if det_t != 0.0 else 0.0

    def mic(v: float) -> np.int64:
        return np.int64(np.floor(v * 1_000_000.0 + 0.5))

    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "r1_micro": [mic(r1)], "r2_micro": [mic(r2)], "r3_micro": [mic(r3)],
            "pacf1_micro": [mic(r1)], "pacf2_micro": [mic(pacf2)],
            "pacf3_micro": [mic(pacf3)],
        }
    )


ORACLES258["events_pacf"] = f"""
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
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS HUGEINT) AS cnt
  FROM grid LEFT JOIN h USING (dy)
),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(cnt) AS s FROM x),
d AS (SELECT dy, m.n * cnt - m.s AS dv FROM x, m),
den AS (SELECT sum(dv * dv) AS den FROM d),
nums AS (
  SELECT
    (SELECT sum(a.dv * b.dv) FROM d a JOIN d b ON b.dy = a.dy + 1) AS n1,
    (SELECT sum(a.dv * b.dv) FROM d a JOIN d b ON b.dy = a.dy + 2) AS n2,
    (SELECT sum(a.dv * b.dv) FROM d a JOIN d b ON b.dy = a.dy + 3) AS n3
),
rr AS (
  SELECT CAST(nums.n1 AS DOUBLE) / CAST(den.den AS DOUBLE) AS r1,
         CAST(nums.n2 AS DOUBLE) / CAST(den.den AS DOUBLE) AS r2,
         CAST(nums.n3 AS DOUBLE) / CAST(den.den AS DOUBLE) AS r3,
         CASE WHEN den.den * den.den - nums.n1 * nums.n1 <> 0
              THEN CAST(nums.n2 * den.den - nums.n1 * nums.n1 AS DOUBLE)
                   / CAST(den.den * den.den - nums.n1 * nums.n1 AS DOUBLE)
              ELSE 0.0 END AS p2
  FROM nums, den
),
dets AS (
  SELECT r1, r2, r3, p2,
         1.0 - 2.0 * r1 * r1 - r2 * r2 + 2.0 * r1 * r1 * r2 AS det_t,
         r3 - 2.0 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 * r1 * r1
           AS det_a
  FROM rr
)
SELECT CAST((SELECT d1 - d0 + 1 FROM g) AS BIGINT) AS n_days,
       CAST(floor(r1 * 1000000.0 + 0.5) AS BIGINT) AS r1_micro,
       CAST(floor(r2 * 1000000.0 + 0.5) AS BIGINT) AS r2_micro,
       CAST(floor(r3 * 1000000.0 + 0.5) AS BIGINT) AS r3_micro,
       CAST(floor(r1 * 1000000.0 + 0.5) AS BIGINT) AS pacf1_micro,
       CAST(floor(p2 * 1000000.0 + 0.5) AS BIGINT) AS pacf2_micro,
       CAST(floor(CASE WHEN det_t <> 0.0 THEN det_a / det_t ELSE 0.0 END
                  * 1000000.0 + 0.5) AS BIGINT) AS pacf3_micro
FROM dets, den
WHERE (SELECT d1 - d0 + 1 FROM g) >= 4 AND den.den <> 0"""


# ---------------------------------------------------------------------------
# docs_sorted_neighborhood — SNM blocking candidate pairs
# ---------------------------------------------------------------------------


def q_docs_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood method (Hernández & Stolfo 1995): sort documents
    by a 12-char space-stripped prefix key (doc_id tie-break), slide a
    window of 4 ranks, and emit every candidate pair at rank gap 1..3 with
    its gap and a same-key flag — the blocking front-end a fuzzy-dedup
    matcher consumes instead of the O(n²) cross join.

    Scale shape: per-batch (doc_id → key) extraction ships ONLY 12-byte
    keys; the global sort is over key material (at 100 TB: range-partition
    by key and overlap partition boundaries by window−1 ranks — never the
    text). The pair emit is vectorized shifted-array zips."""
    keys = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "key": pa.compute.utf8_slice_codeunits(
                        pa.compute.replace_substring(
                            pa.compute.fill_null(t["text"], ""), " ", ""
                        ),
                        0,
                        _SN_KEY_LEN,
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # bounded: key material only (12 B + id per doc)
    )
    cols_empty = {
        "doc_a": pd.Series([], dtype=np.int64),
        "doc_b": pd.Series([], dtype=np.int64),
        "rank_gap": pd.Series([], dtype=np.int64),
        "same_key": pd.Series([], dtype=np.int64),
    }
    if keys.empty:
        return pd.DataFrame(cols_empty)
    keys = keys.sort_values(["key", "doc_id"], kind="mergesort").reset_index(drop=True)
    ids = keys["doc_id"].to_numpy(np.int64)
    kv = keys["key"].to_numpy(object)
    outs = []
    for gap in range(1, _SN_WINDOW):
        if gap >= len(ids):
            break
        a, b = ids[:-gap], ids[gap:]
        same = (kv[:-gap] == kv[gap:]).astype(np.int64)
        outs.append(
            pd.DataFrame(
                {
                    "doc_a": a,
                    "doc_b": b,
                    "rank_gap": np.full(len(a), gap, np.int64),
                    "same_key": same,
                }
            )
        )
    if not outs:
        return pd.DataFrame(cols_empty)
    return (
        pd.concat(outs)
        .sort_values(["doc_a", "doc_b", "rank_gap"])
        .reset_index(drop=True)
    )


ORACLES258["docs_sorted_neighborhood"] = f"""
WITH k AS (
  SELECT doc_id,
         substr(replace(coalesce(text, ''), ' ', ''), 1, {_SN_KEY_LEN}) AS key
  FROM documents
),
r AS (
  SELECT doc_id, key, row_number() OVER (ORDER BY key, doc_id) AS i FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.i - a.i AS BIGINT) AS rank_gap,
       CAST(CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS BIGINT) AS same_key
FROM r a JOIN r b ON b.i > a.i AND b.i - a.i < {_SN_WINDOW}
ORDER BY doc_a, doc_b, rank_gap"""


QUERIES258 = {
    "events_pacf": q_events_pacf,
    "docs_sorted_neighborhood": q_docs_sorted_neighborhood,
}
