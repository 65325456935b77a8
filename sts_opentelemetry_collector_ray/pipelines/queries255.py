"""Driver-contract queries, wave 255 — per-source bigram-LM cross-entropy
(the order-2 upgrade of wave 235's unigram CE: the data-quality filter
KenLM pipelines approximate) and Chatterjee's ξ rank correlation (2020)
between event types' aligned daily series (the ties-general integer
formula — exact until ONE final division).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES255: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_bigram_ce — per-source cross-entropy under the corpus bigram LM
# ---------------------------------------------------------------------------


def q_docs_bigram_ce(sf_dir: str):
    """Per source: cross-entropy (nats/bigram) of the source's word
    bigrams under the CORPUS bigram LM with add-one smoothing —
    p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) with c(w₁·) the bigram-start mass
    and V the corpus unigram vocabulary; H_s = −Σ c_s(w₁w₂)·ln p / N_s,
    perplexity = e^H. The order-2 LM filter: sources whose bigram CE far
    exceeds their unigram CE read locally-incoherent. Output: source,
    n_bigrams, ce_micro, ppl_micro.

    Scale shape: per-batch (source, w₁, w₂) count partials — the driver
    holds only the bigram-vocabulary count table (at 100 TB the same
    fold rides a (w₁,w₂)-hash bucket exchange); corpus text never
    materializes."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        di = np.repeat(np.arange(len(counts)), counts)
        src = np.repeat(src_all, counts)
        keep = flat != ""
        flat, di, src = flat[keep], di[keep], src[keep]
        if len(flat) < 2:
            return pd.DataFrame({"source": [], "w1": [], "w2": [], "c": []})
        same = di[1:] == di[:-1]
        df = pd.DataFrame(
            {"source": src[:-1][same], "w1": flat[:-1][same],
             "w2": flat[1:][same]}
        )
        return (
            df.groupby(["source", "w1", "w2"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    def vocab_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        w = pd.unique(flat[flat != ""])
        return pd.DataFrame({"w": w})

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    voc = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(vocab_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_bigrams", "ce_micro", "ppl_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    sw = part.groupby(["source", "w1", "w2"], as_index=False)["c"].sum()
    g = sw.groupby(["w1", "w2"], as_index=False)["c"].sum()
    start = g.groupby("w1")["c"].sum()
    v = float(voc["w"].nunique())
    gm = g.merge(start.rename("cs"), left_on="w1", right_index=True)
    gm["lp"] = np.log(
        (gm["c"].to_numpy(np.float64) + 1.0)
        / (gm["cs"].to_numpy(np.float64) + v)
    )
    swm = sw.merge(gm[["w1", "w2", "lp"]], on=["w1", "w2"])
    swm["wl"] = swm["c"].to_numpy(np.float64) * swm["lp"].to_numpy(np.float64)
    agg = swm.groupby("source").agg(
        n_bigrams=("c", "sum"), s=("wl", "sum")
    ).sort_index()
    ce = -agg["s"].to_numpy(np.float64) / agg["n_bigrams"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "source": np.asarray(agg.index.to_numpy(object)),
            "n_bigrams": agg["n_bigrams"].to_numpy(np.int64),
            "ce_micro": np.floor(ce * 1_000_000.0 + 0.5).astype(np.int64),
            "ppl_micro": np.floor(
                np.exp(ce) * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )


ORACLES255["docs_bigram_ce"] = """
WITH tl AS (
  SELECT source,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
big AS (
  SELECT source, unnest(ws[:len(ws)-1]) AS w1, unnest(ws[2:]) AS w2
  FROM tl WHERE len(ws) >= 2
),
g AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM big GROUP BY 1, 2),
st AS (SELECT w1, sum(c) AS cs FROM g GROUP BY 1),
voc AS (
  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
  FROM (SELECT unnest(ws) AS w FROM tl)
),
lp AS (
  SELECT g.w1, g.w2, ln((g.c + 1.0) / (st.cs + voc.v)) AS lp
  FROM g JOIN st ON g.w1 = st.w1, voc
),
sc AS (
  SELECT source, w1, w2, CAST(count(*) AS DOUBLE) AS cs
  FROM big GROUP BY 1, 2, 3
),
h AS (
  SELECT sc.source, sum(sc.cs) AS n_bigrams,
         -sum(sc.cs * lp.lp) / sum(sc.cs) AS ce
  FROM sc JOIN lp ON sc.w1 = lp.w1 AND sc.w2 = lp.w2 GROUP BY 1
)
SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(floor(ce * 1000000.0 + 0.5) AS BIGINT) AS ce_micro,
       CAST(floor(exp(ce) * 1000000.0 + 0.5) AS BIGINT) AS ppl_micro
FROM h ORDER BY source"""


# ---------------------------------------------------------------------------
# events_chatterjee_xi — modern rank correlation between type series
# ---------------------------------------------------------------------------


def q_events_chatterjee_xi(sf_dir: str):
    """Chatterjee's ξ (2020) for every ORDERED event-type pair X→Y over
    days common to both daily-count series (pairs with ≥ 30 common days):
    order the pairs by (x, day) — the deterministic day tie-break —
    with r_i = #{j : y_j ≤ y_i} and l_i = #{j : y_j ≥ y_i},
    ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) (the ties-general
    formula; ξ→1 iff y is a measurable function of x). All terms are
    INTEGERS — engines agree exactly until one final division. Output:
    x_type, y_type, n, s1, s2, xi_micro.

    Scale shape: bounded daily fold; each pair's rank scan is one
    searchsorted over ≤ |days| integers on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["x_type", "y_type", "n", "s1", "s2", "xi_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c in ("x_type", "y_type")
                                 else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    types = sorted(daily["event_type"].unique())
    series = {
        et: sub.set_index("day")["n"]
        for et, sub in daily.groupby("event_type")
    }
    rows = []
    for xt in types:
        for yt in types:
            if xt == yt:
                continue
            common = series[xt].index.intersection(series[yt].index)
            n = len(common)
            if n < 30:
                continue
            day = common.to_numpy(np.int64)
            x = series[xt].reindex(common).to_numpy(np.int64)
            y = series[yt].reindex(common).to_numpy(np.int64)
            order = np.lexsort((day, x))
            ys = y[order]
            sy = np.sort(y)
            r = np.searchsorted(sy, ys, side="right").astype(np.int64)
            l = n - np.searchsorted(sy, ys, side="left").astype(np.int64)
            s1 = int(np.abs(np.diff(r)).sum())
            s2 = int((l * (n - l)).sum())
            if s2 == 0:
                continue
            xi = 1.0 - n * float(s1) / (2.0 * float(s2))
            rows.append(
                (xt, yt, np.int64(n), np.int64(s1), np.int64(s2),
                 np.int64(np.floor(xi * 1_000_000.0 + 0.5)))
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


ORACLES255["events_chatterjee_xi"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS x_type, b.event_type AS y_type,
         a.day, a.y AS x, b.y AS y,
         count(*) OVER (PARTITION BY a.event_type, b.event_type) AS n
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type <> b.event_type
),
ok AS (SELECT * FROM pairs WHERE n >= 30),
ranked AS (
  SELECT x_type, y_type, n, x, day, y,
         (SELECT count(*) FROM ok o2
          WHERE o2.x_type = ok.x_type AND o2.y_type = ok.y_type
            AND o2.y <= ok.y) AS r,
         (SELECT count(*) FROM ok o2
          WHERE o2.x_type = ok.x_type AND o2.y_type = ok.y_type
            AND o2.y >= ok.y) AS l
  FROM ok
),
seq AS (
  SELECT x_type, y_type, n, r, l,
         lag(r) OVER (PARTITION BY x_type, y_type ORDER BY x, day)
           AS r_prev
  FROM ranked
),
stat AS (
  SELECT x_type, y_type, any_value(n) AS n,
         CAST(sum(CASE WHEN r_prev IS NULL THEN 0
                       ELSE abs(r - r_prev) END) AS BIGINT) AS s1,
         CAST(sum(l * (n - l)) AS BIGINT) AS s2
  FROM seq GROUP BY 1, 2
)
SELECT x_type, y_type, CAST(n AS BIGINT) AS n, s1, s2,
       CAST(floor((1.0 - n * CAST(s1 AS DOUBLE) / (2.0 * s2))
                  * 1000000.0 + 0.5) AS BIGINT) AS xi_micro
FROM stat WHERE s2 > 0 ORDER BY x_type, y_type"""


QUERIES255 = {
    "docs_bigram_ce": q_docs_bigram_ce,
    "events_chatterjee_xi": q_events_chatterjee_xi,
}
