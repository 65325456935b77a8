"""Driver-contract queries, wave 393 — Kolmogorov-Smirnov uniformity
of event time-of-day phase and the top document-co-occurrence PMI word
pairs. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES393: dict[str, str] = {}

_DAY_US = 86_400_000_000
_PMI_MIN_DOCS = 5


# ---------------------------------------------------------------------------
# events_phase_uniformity_ks — KS against uniform time-of-day
# ---------------------------------------------------------------------------


def q_events_phase_uniformity_ks(sf_dir: str):
    """Is traffic uniform over the day? KS statistic between the
    empirical second-of-day distribution and Uniform[0, 86400):
    D = max over distinct seconds v of max(cum/n - v/86400,
    v/86400 - cum_before/n) — exact counts, mirrored float compares
    (ties on D -> smallest second). One row: n, d_micro, at_second."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        sec = (us % _DAY_US) // 1_000_000
        h = pd.Series(sec).groupby(sec).size()
        return pd.DataFrame(
            {"s": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("s")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n", "d_micro", "at_second"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    s_v = hist.index.to_numpy(np.int64)
    c_v = hist.to_numpy(np.int64)
    n = int(c_v.sum())
    cum = np.cumsum(c_v)
    best_d = -1.0
    best_s = -1
    for i in range(len(s_v)):
        u = float(int(s_v[i])) / 86400.0
        d_plus = float(int(cum[i])) / float(n) - u
        before = int(cum[i - 1]) if i > 0 else 0
        d_minus = u - float(before) / float(n)
        d = d_plus if d_plus >= d_minus else d_minus
        if d > best_d:
            best_d = d
            best_s = int(s_v[i])
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(best_d * 1_000_000.0 + 0.5)),
                np.int64(best_s),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES393["events_phase_uniformity_ks"] = f"""
WITH b AS (
  SELECT (epoch_us(ts) % {_DAY_US}) // 1000000 AS s
  FROM events
),
h AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (
  SELECT s, c, sum(c) OVER (ORDER BY s) AS cc FROM h
),
d AS (
  SELECT s,
         greatest(CAST(cc AS DOUBLE) / nn.n
                    - CAST(s AS DOUBLE) / 86400.0,
                  CAST(s AS DOUBLE) / 86400.0
                    - CAST(cc - c AS DOUBLE) / nn.n) AS dd
  FROM cum, nn
),
best AS (
  SELECT s, dd, row_number() OVER (ORDER BY dd DESC, s) AS rk FROM d
)
SELECT nn.n,
       CAST(floor(best.dd * 1000000.0 + 0.5) AS BIGINT) AS d_micro,
       CAST(best.s AS BIGINT) AS at_second
FROM best, nn
WHERE best.rk = 1"""


# ---------------------------------------------------------------------------
# docs_word_doc_pmi_top — top co-occurrence PMI pairs
# ---------------------------------------------------------------------------


def q_docs_word_doc_pmi_top(sf_dir: str):
    """Which words co-occur in documents beyond chance? With document
    frequencies df(w) and pair document counts df(a, b) (both words
    present), PMI = ln(df(a,b) * N / (df(a) * df(b))); pairs with
    support >= 5 docs, top-10 by PMI (ties by words). Per pair:
    word_a, word_b, n_docs_both, pmi_milli."""

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
        return pd.DataFrame(
            {"d": did[keep], "w": flat[keep]}
        ).drop_duplicates()

    ws = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["word_a", "word_b", "n_docs_both", "pmi_milli"]
    empty = pd.DataFrame(
        {
            "word_a": pd.Series([], dtype=object),
            "word_b": pd.Series([], dtype=object),
            "n_docs_both": pd.Series([], dtype=np.int64),
            "pmi_milli": pd.Series([], dtype=np.int64),
        }
    )
    if ws.empty:
        return empty
    n_docs = int(ws["d"].nunique())
    df_w = ws.groupby("w")["d"].nunique()
    doc_words = {int(d): sorted(sub["w"]) for d, sub in ws.groupby("d")}
    pair_c = {}
    for words in doc_words.values():
        for a, b in itertools.combinations(words, 2):
            pair_c[(a, b)] = pair_c.get((a, b), 0) + 1
    recs = []
    for (a, b), c in pair_c.items():
        if c < _PMI_MIN_DOCS:
            continue
        pmi = float(np.log(
            float(c) * float(n_docs)
            / (float(int(df_w[a])) * float(int(df_w[b])))
        ))
        recs.append((a, b, c, pmi))
    if not recs:
        return empty
    recs.sort(key=lambda r: (-r[3], r[0], r[1]))
    recs = recs[:10]
    return pd.DataFrame(
        [
            (a, b, np.int64(c),
             np.int64(np.floor(pmi * 1_000.0 + 0.5)))
            for a, b, c, pmi in recs
        ],
        columns=cols,
    ).astype({"n_docs_both": np.int64, "pmi_milli": np.int64})


ORACLES393["docs_word_doc_pmi_top"] = rf"""
WITH ws AS (
  SELECT DISTINCT doc_id AS d,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
nn AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n FROM ws),
dfw AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM ws GROUP BY 1),
pairs AS (
  SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS c
  FROM ws a JOIN ws b ON a.d = b.d AND a.w < b.w
  GROUP BY 1, 2
  HAVING count(*) >= {_PMI_MIN_DOCS}
),
pmi AS (
  SELECT p.wa, p.wb, p.c,
         ln(CAST(p.c AS DOUBLE) * nn.n
            / (CAST(da.df AS DOUBLE) * db.df)) AS pmi
  FROM pairs p
  JOIN dfw da ON da.w = p.wa
  JOIN dfw db ON db.w = p.wb, nn
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, wa, wb) AS rk
  FROM pmi
)
SELECT wa AS word_a, wb AS word_b, c AS n_docs_both,
       CAST(floor(pmi * 1000.0 + 0.5) AS BIGINT) AS pmi_milli
FROM ranked
WHERE rk <= 10
ORDER BY rk"""


QUERIES393 = {
    "events_phase_uniformity_ks": q_events_phase_uniformity_ks,
    "docs_word_doc_pmi_top": q_docs_word_doc_pmi_top,
}
