"""Driver-contract queries, wave 241 — McNemar's paired test (1947) on the
two wave-226 quality filters (the discordant-cell complement of their
Cohen's kappa) and Theil's U uncertainty coefficient U(event_type | dow)
(Theil 1970 — the asymmetric "how much does the weekday tell you about
the event type" association).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .queries226 import _STOPS

ORACLES241: dict[str, str] = {}

_MCNEMAR_CRIT = 3.841458820694124  # chi2(1) at 5%


# ---------------------------------------------------------------------------
# docs_mcnemar — paired filter disagreement test
# ---------------------------------------------------------------------------


def q_docs_mcnemar(sf_dir: str):
    """McNemar's test over the SAME paired filters as docs_filter_kappa
    (A = token count ≥ lower-median, B = stopword ratio ≤ lower-median):
    with discordant cells b = |A∧¬B| and c = |¬A∧B|, χ² = (b−c)²/(b+c)
    and the continuity-corrected (|b−c|−1)²/(b+c); rejected at the 5%
    χ²(1) bound 3.8415. One row: n, n_discordant, chi2_micro,
    chi2_cc_micro, reject_5pct.

    Scale shape: same per-doc combiner pass as docs_filter_kappa; the
    table fold is four scalars."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        nonempty = flat != ""
        ntok = np.bincount(di[nonempty], minlength=len(counts)).astype(np.int64)
        stop = np.isin(flat, _STOPS)
        nstop = np.bincount(di[stop], minlength=len(counts)).astype(np.int64)
        return pd.DataFrame({"ntok": ntok, "nstop": nstop})

    per = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "n_discordant", "chi2_micro", "chi2_cc_micro", "reject_5pct"]
    per = per[per["ntok"] > 0]
    if per.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    ratio = per["nstop"].to_numpy(np.float64) / per["ntok"].to_numpy(np.float64)
    ntok = per["ntok"].to_numpy(np.int64)
    n = len(per)
    med_tok = np.sort(ntok)[(n + 1) // 2 - 1]
    med_ratio = np.sort(ratio)[(n + 1) // 2 - 1]
    a = ntok >= med_tok
    b_f = ratio <= med_ratio
    b = int((a & ~b_f).sum())
    c = int((~a & b_f).sum())
    if b + c == 0:
        chi2 = 0.0
        cc = 0.0
    else:
        chi2 = (b - c) ** 2 / float(b + c)
        cc = (abs(b - c) - 1.0) ** 2 / float(b + c)
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "n_discordant": [np.int64(b + c)],
            "chi2_micro": [np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))],
            "chi2_cc_micro": [np.int64(np.floor(cc * 1_000_000.0 + 0.5))],
            "reject_5pct": [np.int64(1 if cc > _MCNEMAR_CRIT else 0)],
        }
    )


ORACLES241["docs_mcnemar"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) AS BIGINT) AS ntok,
         CAST(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT)
           AS nstop
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
flags AS (
  SELECT CASE WHEN per.ntok >= mt.m THEN 1 ELSE 0 END AS a,
         CASE WHEN CAST(per.nstop AS DOUBLE) / per.ntok <= mr.m
              THEN 1 ELSE 0 END AS b
  FROM per, mt, mr
),
t2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * (1 - b)) AS BIGINT) AS b,
         CAST(sum((1 - a) * b) AS BIGINT) AS c
  FROM flags
),
s AS (
  SELECT n, b + c AS nd,
         CASE WHEN b + c > 0
              THEN CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
              ELSE 0.0 END AS chi2,
         CASE WHEN b + c > 0
              THEN (abs(CAST(b - c AS DOUBLE)) - 1.0)
                   * (abs(CAST(b - c AS DOUBLE)) - 1.0) / (b + c)
              ELSE 0.0 END AS cc
  FROM t2
)
SELECT n, nd AS n_discordant,
       CAST(floor(chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(cc * 1000000.0 + 0.5) AS BIGINT) AS chi2_cc_micro,
       CAST(CASE WHEN cc > {_MCNEMAR_CRIT} THEN 1 ELSE 0 END AS BIGINT)
         AS reject_5pct
FROM s"""


# ---------------------------------------------------------------------------
# events_theil_u — uncertainty coefficient U(event_type | dow)
# ---------------------------------------------------------------------------


def q_events_theil_u(sf_dir: str):
    """Theil's uncertainty coefficient U(type|dow) = (H(type) −
    H(type|dow)) / H(type) over the (event_type, ISO dow) contingency
    table — the asymmetric share of event-type entropy the weekday
    explains (and the reverse U(dow|type)). One row: n, h_type_micro,
    h_dow_micro, u_type_given_dow_micro, u_dow_given_type_micro.

    Scale shape: per-batch (type, dow) count partials; a |types|×7 table
    folds on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type"]).to_pandas()
        df["dow"] = pd.Series(
            t["ts"].to_numpy(zero_copy_only=False)
        ).dt.dayofweek.astype(np.int64)
        return (
            df.groupby(["event_type", "dow"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "h_type_micro", "h_dow_micro",
            "u_type_given_dow_micro", "u_dow_given_type_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    ct = part.groupby(["event_type", "dow"])["c"].sum()
    n = float(ct.sum())
    p = ct.to_numpy(np.float64) / n
    pt = ct.groupby(level=0).sum().to_numpy(np.float64) / n
    pdw = ct.groupby(level=1).sum().to_numpy(np.float64) / n
    h_t = float(-(pt * np.log(pt)).sum())
    h_d = float(-(pdw * np.log(pdw)).sum())
    h_td = float(-(p * np.log(p)).sum())
    # H(type|dow) = H(type,dow) - H(dow)
    u_t_d = (h_t - (h_td - h_d)) / h_t if h_t > 0.0 else 0.0
    u_d_t = (h_d - (h_td - h_t)) / h_d if h_d > 0.0 else 0.0
    micro = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {"n": [np.int64(n)], "h_type_micro": [micro(h_t)],
         "h_dow_micro": [micro(h_d)],
         "u_type_given_dow_micro": [micro(u_t_d)],
         "u_dow_given_type_micro": [micro(u_d_t)]}
    )


ORACLES241["events_theil_u"] = """
WITH ct AS (
  SELECT event_type, dayofweek(ts) AS dow, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(c) AS n FROM ct),
ht AS (
  SELECT -sum(p * ln(p)) AS h FROM (
    SELECT sum(c) / tot.n AS p FROM ct, tot GROUP BY event_type, tot.n
  )
),
hd AS (
  SELECT -sum(p * ln(p)) AS h FROM (
    SELECT sum(c) / tot.n AS p FROM ct, tot GROUP BY dow, tot.n
  )
),
htd AS (SELECT -sum(c / tot.n * ln(c / tot.n)) AS h FROM ct, tot)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST(floor(ht.h * 1000000.0 + 0.5) AS BIGINT) AS h_type_micro,
       CAST(floor(hd.h * 1000000.0 + 0.5) AS BIGINT) AS h_dow_micro,
       CAST(floor((CASE WHEN ht.h > 0.0
                        THEN (ht.h - (htd.h - hd.h)) / ht.h ELSE 0.0 END)
                  * 1000000.0 + 0.5) AS BIGINT) AS u_type_given_dow_micro,
       CAST(floor((CASE WHEN hd.h > 0.0
                        THEN (hd.h - (htd.h - ht.h)) / hd.h ELSE 0.0 END)
                  * 1000000.0 + 0.5) AS BIGINT) AS u_dow_given_type_micro
FROM tot, ht, hd, htd"""


QUERIES241 = {
    "docs_mcnemar": q_docs_mcnemar,
    "events_theil_u": q_events_theil_u,
}
