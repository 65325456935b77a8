"""Driver-contract queries, wave 235 — Theil-Sen robust trend slope of the
daily count series (median of all pairwise slopes; Theil 1950, Sen 1968)
and per-source unigram cross-entropy / perplexity under the corpus
add-one-smoothed unigram LM (the classic LM-quality filter signal).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES235: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_theil_sen — median-of-pairwise-slopes trend per type
# ---------------------------------------------------------------------------


def q_events_theil_sen(sf_dir: str):
    """Per event type: the Theil-Sen slope of daily counts on the day
    index t = 0..n−1 — the median over all n(n−1)/2 pairwise slopes
    (y_j − y_i)/(j − i), i < j (types with < 5 days drop). Output:
    event_type, n_days, n_pairs, slope_micro.

    Scale shape: bounded daily fold; the ≤ n²/2 pairwise-slope set per
    type is a vectorized upper-triangle broadcast on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "n_pairs", "slope_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        if n < 5:
            continue
        t = np.arange(n, dtype=np.float64)
        iu = np.triu_indices(n, k=1)
        slopes = (y[iu[1]] - y[iu[0]]) / (t[iu[1]] - t[iu[0]])
        med = float(np.median(slopes))
        rows.append(
            (et, np.int64(n), np.int64(len(slopes)),
             np.int64(np.floor(med * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES235["events_theil_sen"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
pairs AS (
  SELECT a.event_type, any_value(a.n) AS n,
         (b.y - a.y) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND b.t > a.t
  WHERE a.n >= 5
  GROUP BY a.event_type, b.t, a.t, b.y, a.y
)
SELECT event_type,
       CAST(any_value(n) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(median(s) * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
FROM pairs GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# docs_unigram_ce — per-source cross-entropy under the corpus unigram LM
# ---------------------------------------------------------------------------


def q_docs_unigram_ce(sf_dir: str):
    """Per source: cross-entropy (nats/token) of the source's tokens under
    the CORPUS unigram LM with add-one smoothing — p(w) = (c(w)+1)/(N+V)
    over whitespace tokens (empties drop), H_s = −Σ_w c_s(w)·ln p(w) / N_s,
    perplexity = e^H. Low-CE sources read like the corpus; high-CE sources
    are the outliers an LM-quality filter flags. Output: source, n_tokens,
    ce_micro, ppl_micro.

    Scale shape: one read folds (source, word) count partials per batch;
    the driver holds only the vocabulary-sized count table (the same bound
    as q_docs_vocab) — corpus text never materializes."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        src = np.repeat(src_all, counts)
        keep = flat != ""
        df = pd.DataFrame({"source": src[keep], "w": flat[keep]})
        return (
            df.groupby(["source", "w"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_tokens", "ce_micro", "ppl_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    sw = part.groupby(["source", "w"], as_index=False)["c"].sum()
    g = sw.groupby("w", as_index=False)["c"].sum()
    n_total = float(g["c"].sum())
    v = float(len(g))
    logp = pd.Series(
        np.log((g["c"].to_numpy(np.float64) + 1.0) / (n_total + v)),
        index=g["w"],
    )
    sw["lp"] = logp.reindex(sw["w"]).to_numpy(np.float64)
    sw["wl"] = sw["c"].to_numpy(np.float64) * sw["lp"].to_numpy(np.float64)
    agg = sw.groupby("source").agg(
        n_tokens=("c", "sum"), s=("wl", "sum")
    ).sort_index()
    ce = -agg["s"].to_numpy(np.float64) / agg["n_tokens"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "source": np.asarray(agg.index.to_numpy(object)),
            "n_tokens": agg["n_tokens"].to_numpy(np.int64),
            "ce_micro": np.floor(ce * 1_000_000.0 + 0.5).astype(np.int64),
            "ppl_micro": np.floor(
                np.exp(ce) * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )


ORACLES235["docs_unigram_ce"] = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
t AS (SELECT source, w FROM tok WHERE w <> ''),
g AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY 1),
tot AS (
  SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS v FROM g
),
lp AS (SELECT w, ln((c + 1.0) / (tot.n + tot.v)) AS lp FROM g, tot),
sc AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS cs FROM t GROUP BY 1, 2),
h AS (
  SELECT sc.source, sum(sc.cs) AS n_tokens,
         -sum(sc.cs * lp.lp) / sum(sc.cs) AS ce
  FROM sc JOIN lp ON sc.w = lp.w GROUP BY 1
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(ce * 1000000.0 + 0.5) AS BIGINT) AS ce_micro,
       CAST(floor(exp(ce) * 1000000.0 + 0.5) AS BIGINT) AS ppl_micro
FROM h ORDER BY source"""


QUERIES235 = {
    "events_theil_sen": q_events_theil_sen,
    "docs_unigram_ce": q_docs_unigram_ce,
}
