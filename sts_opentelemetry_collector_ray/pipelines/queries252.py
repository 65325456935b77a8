"""Driver-contract queries, wave 252 — the one-sample Wilcoxon signed-rank
test (1945) that consecutive-day count changes are median-zero (the
rank-powered upgrade of wave 251's sign test) and Cochran's Q (1950) that
three binary document-quality filters pass at equal rates (the k=3
generalization of wave 241's McNemar).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .queries226 import _STOPS

ORACLES252: dict[str, str] = {}

_CHI2_2_CRIT = 5.991464547107979  # chi2(2) at 5%


# ---------------------------------------------------------------------------
# events_wilcoxon_signed_rank — median-zero test on daily changes
# ---------------------------------------------------------------------------


def q_events_wilcoxon_signed_rank(sf_dir: str):
    """Per event type: the Wilcoxon signed-rank test that consecutive-day
    count changes d_t = y_t − y_{t−1} have symmetric-about-zero law — zeros
    drop, |d| gets average ranks (counts are integers so the ranks are
    exact half-integers), W⁺ = Σ ranks of positive d,
    z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48) with the tie
    masses t over equal-|d| groups (types with < 8 nonzero diffs or zero
    variance drop). Output: event_type, n, w_plus_half (2·W⁺, exact
    integer), z_micro.

    Scale shape: bounded daily fold; the rank scan is one np.unique over
    ≤ |days| integer diffs per type on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n", "w_plus_half", "z_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub.sort_values("day")["n"].to_numpy(np.int64)
        d = np.diff(y)
        d = d[d != 0]
        n = len(d)
        if n < 8:
            continue
        ad = np.abs(d)
        order = np.argsort(ad, kind="mergesort")
        s = ad[order]
        # average ranks over equal-|d| runs (integer diffs -> exact)
        uniq, start = np.unique(s, return_index=True)
        cnt = np.diff(np.append(start, n))
        avg = start + (cnt + 1) / 2.0  # 1-based average rank per group
        rank_of = dict(zip(uniq.tolist(), avg.tolist()))
        ranks = np.array([rank_of[v] for v in ad.tolist()], np.float64)
        wp = float(ranks[d > 0].sum())
        tie = float((cnt.astype(np.float64) ** 3 - cnt).sum())
        var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
        if var <= 0.0:
            continue
        z = (wp - n * (n + 1) / 4.0) / math.sqrt(var)
        rows.append(
            (et, np.int64(n), np.int64(round(2.0 * wp)),
             np.int64(np.floor(z * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES252["events_wilcoxon_signed_rank"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
lagd AS (
  SELECT event_type,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS d
  FROM daily
),
nz AS (
  SELECT event_type, d, abs(d) AS ad
  FROM lagd WHERE d IS NOT NULL AND d <> 0
),
sized AS (
  SELECT event_type, d, ad,
         count(*) OVER (PARTITION BY event_type) AS n,
         rank() OVER (PARTITION BY event_type ORDER BY ad) AS r_first,
         count(*) OVER (PARTITION BY event_type, ad) AS t
  FROM nz
),
ok AS (SELECT * FROM sized WHERE n >= 8),
wp AS (
  SELECT event_type, any_value(n) AS n,
         sum(CASE WHEN d > 0 THEN r_first + (t - 1) / 2.0 ELSE 0 END) AS wp
  FROM ok GROUP BY 1
),
ties AS (
  SELECT event_type, sum(t * t * t - t) AS tie
  FROM (SELECT event_type, ad, CAST(count(*) AS DOUBLE) AS t
        FROM ok GROUP BY 1, 2)
  GROUP BY 1
),
stat AS (
  SELECT wp.event_type, wp.n, wp.wp,
         wp.n * (wp.n + 1) * (2 * wp.n + 1) / 24.0 - ties.tie / 48.0 AS var
  FROM wp JOIN ties USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(round(2.0 * wp) AS BIGINT) AS w_plus_half,
       CAST(floor((wp - n * (n + 1) / 4.0) / sqrt(var) * 1000000.0 + 0.5)
            AS BIGINT) AS z_micro
FROM stat WHERE var > 0.0 ORDER BY event_type"""


# ---------------------------------------------------------------------------
# docs_cochran_q — three binary quality filters pass at equal rates?
# ---------------------------------------------------------------------------


def q_docs_cochran_q(sf_dir: str):
    """Cochran's Q over three binary per-document quality filters —
    A = token count ≥ lower-median, B = stopword ratio ≤ lower-median,
    C = mean word length ≤ lower-median (medians over nonempty docs; the
    k=3 blocked-binary generalization of docs_mcnemar's pair): with
    column totals C_j and row sums R_i, Q = k(k−1)·Σ_j(C_j − N/k)² /
    (kN − Σ R_i²), rejected at the 5% χ²(2) bound 5.9915. One row: n,
    c_a, c_b, c_c, q_micro, reject_5pct.

    Scale shape: one per-doc (ntok, nstop, nchar) combiner pass; the Q
    algebra folds three scalars plus a bounded R-histogram."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat_arr = toks.flatten()
        flat = np.asarray(flat_arr.to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        nonempty = flat != ""
        ntok = np.bincount(di[nonempty], minlength=len(counts)).astype(np.int64)
        stop = np.isin(flat, _STOPS)
        nstop = np.bincount(di[stop], minlength=len(counts)).astype(np.int64)
        lens = np.asarray(
            pc.binary_length(flat_arr).to_numpy(zero_copy_only=False), np.int64
        )
        nchar = np.bincount(
            di, weights=lens.astype(np.float64), minlength=len(counts)
        ).astype(np.int64)
        return pd.DataFrame({"ntok": ntok, "nstop": nstop, "nchar": nchar})

    per = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "c_a", "c_b", "c_c", "q_micro", "reject_5pct"]
    per = per[per["ntok"] > 0]
    if per.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    ntok = per["ntok"].to_numpy(np.int64)
    ratio = per["nstop"].to_numpy(np.float64) / ntok
    mwl = per["nchar"].to_numpy(np.float64) / ntok
    n = len(per)
    med_tok = np.sort(ntok)[(n + 1) // 2 - 1]
    med_ratio = np.sort(ratio)[(n + 1) // 2 - 1]
    med_mwl = np.sort(mwl)[(n + 1) // 2 - 1]
    a = (ntok >= med_tok).astype(np.int64)
    b = (ratio <= med_ratio).astype(np.int64)
    c = (mwl <= med_mwl).astype(np.int64)
    r = a + b + c
    big_n = int(r.sum())
    denom = 3 * big_n - int((r * r).sum())
    ca, cb, cc = int(a.sum()), int(b.sum()), int(c.sum())
    if denom <= 0:
        q = 0.0
    else:
        mean_c = big_n / 3.0
        q = (
            3.0 * 2.0
            * ((ca - mean_c) ** 2 + (cb - mean_c) ** 2 + (cc - mean_c) ** 2)
            / denom
        )
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "c_a": [np.int64(ca)],
            "c_b": [np.int64(cb)],
            "c_c": [np.int64(cc)],
            "q_micro": [np.int64(np.floor(q * 1_000_000.0 + 0.5))],
            "reject_5pct": [np.int64(1 if q > _CHI2_2_CRIT else 0)],
        }
    )


ORACLES252["docs_cochran_q"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) AS BIGINT) AS ntok,
         CAST(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT)
           AS nstop,
         CAST(sum(length(w)) AS BIGINT) AS nchar
  FROM tok GROUP BY 1 HAVING sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) > 0
),
mt AS (
  SELECT ntok AS m FROM (
    SELECT ntok, row_number() OVER (ORDER BY ntok) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
mr AS (
  SELECT ratio AS m FROM (
    SELECT CAST(nstop AS DOUBLE) / ntok AS ratio,
           row_number() OVER (ORDER BY CAST(nstop AS DOUBLE) / ntok) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
mw AS (
  SELECT mwl AS m FROM (
    SELECT CAST(nchar AS DOUBLE) / ntok AS mwl,
           row_number() OVER (ORDER BY CAST(nchar AS DOUBLE) / ntok) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
flags AS (
  SELECT CASE WHEN per.ntok >= mt.m THEN 1 ELSE 0 END AS a,
         CASE WHEN CAST(per.nstop AS DOUBLE) / per.ntok <= mr.m
              THEN 1 ELSE 0 END AS b,
         CASE WHEN CAST(per.nchar AS DOUBLE) / per.ntok <= mw.m
              THEN 1 ELSE 0 END AS c
  FROM per, mt, mr, mw
),
tots AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb,
         CAST(sum(c) AS BIGINT) AS cc,
         CAST(sum(a + b + c) AS BIGINT) AS bign,
         CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS r2
  FROM flags
)
SELECT n, ca AS c_a, cb AS c_b, cc AS c_c,
       CAST(floor(CASE WHEN 3 * bign - r2 <= 0 THEN 0.0
         ELSE 3.0 * 2.0 * ((ca - bign / 3.0) * (ca - bign / 3.0)
                           + (cb - bign / 3.0) * (cb - bign / 3.0)
                           + (cc - bign / 3.0) * (cc - bign / 3.0))
              / (3 * bign - r2) END * 1000000.0 + 0.5) AS BIGINT) AS q_micro,
       CAST(CASE WHEN 3 * bign - r2 > 0
                  AND 3.0 * 2.0 * ((ca - bign / 3.0) * (ca - bign / 3.0)
                                   + (cb - bign / 3.0) * (cb - bign / 3.0)
                                   + (cc - bign / 3.0) * (cc - bign / 3.0))
                      / (3 * bign - r2) > 5.991464547107979
            THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM tots"""


QUERIES252 = {
    "events_wilcoxon_signed_rank": q_events_wilcoxon_signed_rank,
    "docs_cochran_q": q_docs_cochran_q,
}
