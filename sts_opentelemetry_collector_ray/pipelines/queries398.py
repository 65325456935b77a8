"""Driver-contract queries, wave 398 — isotonic regression of mean
event value over hour-of-day (exact minimax form of PAVA on the 24
bounded cells) and BM25 retrieval scoring of documents against the
three most frequent corpus words. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES398: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QWORDS = 3


# ---------------------------------------------------------------------------
# events_hourly_isotonic — monotone fit of hourly mean value
# ---------------------------------------------------------------------------


def q_events_hourly_isotonic(sf_dir: str):
    """Isotonic regression over hour-of-day: the weighted monotone
    (non-decreasing) fit of mean value cents equals the minimax
    iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) over the 24 cells
    (exact integer segment sums, double divisions, pure min/max).
    Per hour: hr, n, mean_milli, iso_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        ) % 24
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"hr": hr, "n": 1, "s": cents})
            .groupby("hr", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")[["n", "s"]]
        .sum()
        .sort_index()
    )
    cols = ["hr", "n", "mean_milli", "iso_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cells.empty or len(cells) < 2:
        return empty
    hrs = cells.index.to_numpy(np.int64)
    nv = cells["n"].to_numpy(np.int64)
    sv = cells["s"].to_numpy(np.int64)
    m = len(hrs)
    cum_n = np.concatenate([[0], np.cumsum(nv)])
    cum_s = np.concatenate([[0], np.cumsum(sv.astype(object))])
    rows = []
    for i in range(m):
        best_max = None
        for j in range(i + 1):
            best_min = None
            for k in range(i, m):
                seg_s = int(cum_s[k + 1]) - int(cum_s[j])
                seg_n = int(cum_n[k + 1]) - int(cum_n[j])
                v = float(seg_s) / float(seg_n)
                if best_min is None or v < best_min:
                    best_min = v
            if best_max is None or best_min > best_max:
                best_max = best_min
        mean = float(int(sv[i])) / float(int(nv[i]))
        rows.append(
            (
                np.int64(int(hrs[i])), np.int64(int(nv[i])),
                np.int64(np.floor(mean / 100.0 * 1_000.0 + 0.5)),
                np.int64(np.floor(best_max / 100.0 * 1_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES398["events_hourly_isotonic"] = f"""
WITH b AS (
  SELECT CAST((epoch_us(ts) // {_HOUR_US}) % 24 AS BIGINT) AS hr,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
),
cells AS (
  SELECT hr, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
  FROM b GROUP BY 1
),
idx AS (
  SELECT hr, n, s, row_number() OVER (ORDER BY hr) AS i
  FROM cells
),
cum AS (
  SELECT i, hr, n, s,
         sum(n) OVER (ORDER BY i) AS cn,
         sum(s) OVER (ORDER BY i) AS cs
  FROM idx
),
segs AS (
  SELECT a.i AS j, b.i AS k,
         CAST(b.cs - (a.cs - a.s) AS DOUBLE)
           / (b.cn - (a.cn - a.n)) AS mean
  FROM cum a JOIN cum b ON b.i >= a.i
),
inner_min AS (
  SELECT p.i, s.j, min(s.mean) AS mn
  FROM (SELECT i FROM idx) p
  JOIN segs s ON s.j <= p.i AND s.k >= p.i
  GROUP BY 1, 2
),
iso AS (
  SELECT i, max(mn) AS iso FROM inner_min GROUP BY 1
)
SELECT idx.hr, idx.n,
       CAST(floor(CAST(idx.s AS DOUBLE) / idx.n / 100.0 * 1000.0 + 0.5)
            AS BIGINT) AS mean_milli,
       CAST(floor(iso.iso / 100.0 * 1000.0 + 0.5) AS BIGINT)
         AS iso_milli
FROM idx JOIN iso USING (i)
WHERE (SELECT count(*) FROM idx) >= 2
ORDER BY idx.hr"""


# ---------------------------------------------------------------------------
# docs_bm25_top — BM25 retrieval against top corpus words
# ---------------------------------------------------------------------------


def q_docs_bm25_top(sf_dir: str):
    """BM25: the query is the 3 most frequent corpus words (count
    desc, word asc); each doc scores sum over query words of
    idf * c (k1 + 1) / (c + k1 (1 - b + b len/avglen)) with
    idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75
    (folds in word order; ties -> smaller doc_id). Top-5 docs:
    doc_id, score_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        did = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lens,
        )
        keep = flat != ""
        g = (
            pd.DataFrame({"d": did[keep], "w": flat[keep]})
            .groupby(["d", "w"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    wc = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["d", "w"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["doc_id", "score_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if wc.empty:
        return empty
    n_docs = int(wc["d"].nunique())
    doc_len = wc.groupby("d")["c"].sum()
    total_len = int(doc_len.sum())
    avg_len = float(total_len) / float(n_docs)
    corpus = wc.groupby("w")["c"].sum().reset_index()
    corpus = corpus.sort_values(["c", "w"], ascending=[False, True])
    qwords = sorted(corpus.head(_BM25_QWORDS)["w"])
    df_w = wc[wc["w"].isin(qwords)].groupby("w")["d"].nunique()
    idf = {
        w_: float(np.log(
            (float(n_docs) - float(int(df_w[w_])) + 0.5)
            / (float(int(df_w[w_])) + 0.5) + 1.0
        ))
        for w_ in qwords
    }
    cmap = {
        (int(r["d"]), r["w"]): int(r["c"])
        for _, r in wc[wc["w"].isin(qwords)].iterrows()
    }
    recs = []
    for d_ in sorted(int(x) for x in doc_len.index):
        ln_ = float(int(doc_len[d_]))
        score = 0.0
        for w_ in qwords:
            c = cmap.get((d_, w_), 0)
            if c == 0:
                continue
            score = score + idf[w_] * (
                float(c) * (_BM25_K1 + 1.0)
                / (float(c) + _BM25_K1
                   * (1.0 - _BM25_B + _BM25_B * ln_ / avg_len))
            )
        recs.append((d_, score))
    recs.sort(key=lambda r: (-r[1], r[0]))
    recs = recs[:5]
    return pd.DataFrame(
        [
            (np.int64(d_), np.int64(np.floor(s * 1_000.0 + 0.5)))
            for d_, s in recs
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES398["docs_bm25_top"] = rf"""
WITH tok AS (
  SELECT doc_id AS d,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
wc AS (
  SELECT d, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
),
dl AS (SELECT d, CAST(sum(c) AS BIGINT) AS len FROM wc GROUP BY 1),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(len) AS BIGINT) AS tl
  FROM dl
),
qw AS (
  SELECT w, row_number() OVER (ORDER BY sum(c) DESC, w) AS rk
  FROM wc GROUP BY w
  QUALIFY rk <= {_BM25_QWORDS}
),
dfw AS (
  SELECT wc.w, CAST(count(DISTINCT wc.d) AS BIGINT) AS df
  FROM wc JOIN qw USING (w) GROUP BY 1
),
terms AS (
  SELECT dl.d, dfw.w,
         ln((CAST(meta.nd AS DOUBLE) - dfw.df + 0.5)
            / (CAST(dfw.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(wc.c AS DOUBLE) * ({_BM25_K1} + 1.0)
              / (CAST(wc.c AS DOUBLE) + {_BM25_K1}
                 * (1.0 - {_BM25_B} + {_BM25_B}
                    * CAST(dl.len AS DOUBLE)
                    / (CAST(meta.tl AS DOUBLE) / meta.nd)))) AS t
  FROM dl
  JOIN wc ON wc.d = dl.d
  JOIN dfw ON dfw.w = wc.w, meta
  WHERE wc.c > 0
),
scores AS (
  SELECT dl.d,
         coalesce(f.acc, 0.0) AS score
  FROM dl
  LEFT JOIN (
    SELECT d, list_reduce(list_prepend(0.0, list(t ORDER BY w)),
                          (a, b) -> a + b) AS acc
    FROM terms GROUP BY 1
  ) f ON f.d = dl.d
),
ranked AS (
  SELECT d, score,
         row_number() OVER (ORDER BY score DESC, d) AS rk
  FROM scores
)
SELECT CAST(d AS BIGINT) AS doc_id,
       CAST(floor(score * 1000.0 + 0.5) AS BIGINT) AS score_milli
FROM ranked
WHERE rk <= 5
ORDER BY rk"""


QUERIES398 = {
    "events_hourly_isotonic": q_events_hourly_isotonic,
    "docs_bm25_top": q_docs_bm25_top,
}
