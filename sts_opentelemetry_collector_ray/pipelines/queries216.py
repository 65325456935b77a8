"""Driver-contract queries, wave 216 — Self-BLEU-2 corpus diversity (share
of each doc's bigram occurrences that appear in ANOTHER doc of the same
source; Zhu et al. 2018 simplified to bigram precision) and Distinct-1/
Distinct-2 (Li et al. 2016) per source.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES216: dict[str, str] = {}


def _bigram_frame(t: pa.Table) -> pd.DataFrame:
    """(doc_id, source, bigram) rows for every bigram occurrence."""
    toks = pc.split_pattern(t["text"], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
    counts = np.maximum(np.diff(off) - 1, 0)
    if counts.sum() == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "source": pd.Series([], dtype=object),
             "bg": pd.Series([], dtype=object)}
        )
    starts = off[:-1]
    first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(first, counts)
    i0 = np.repeat(starts, counts) + within
    prev = flat.take(pa.array(i0))
    cur = flat.take(pa.array(i0 + 1))
    bg = pc.binary_join_element_wise(prev, cur, " ")
    return pd.DataFrame(
        {
            "doc_id": np.repeat(
                np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64),
                counts,
            ),
            "source": np.repeat(
                np.asarray(t["source"].to_numpy(zero_copy_only=False), object),
                counts,
            ),
            "bg": np.asarray(bg.to_numpy(zero_copy_only=False), object),
        }
    )


# ---------------------------------------------------------------------------
# docs_self_bleu — bigram-precision self-similarity per source
# ---------------------------------------------------------------------------


def q_docs_self_bleu(sf_dir: str):
    """Per source: mean over docs of the share of the doc's bigram
    OCCURRENCES that also appear in at least one OTHER doc of the same
    source (Self-BLEU-2 precision; high = low diversity). Docs with no
    bigrams drop. Output: source, n_docs, self_bleu_micro.

    Scale shape: pass 1 folds the bounded (source, bigram, doc-count)
    vocabulary and broadcasts the shared-bigram set; pass 2 is a per-batch
    per-doc ratio combiner — bigram text never shuffles."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "text"])

    def vocab_partial(t: pa.Table) -> pd.DataFrame:
        df = _bigram_frame(t)
        if df.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "bg": pd.Series([], dtype=object),
                 "doc_id": pd.Series([], dtype=np.int64)}
            )
        return df.drop_duplicates()

    vp = ds.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    cols = ["source", "n_docs", "self_bleu_micro"]
    empty = pd.DataFrame(
        {"source": pd.Series([], dtype=object),
         "n_docs": pd.Series([], dtype=np.int64),
         "self_bleu_micro": pd.Series([], dtype=np.int64)}
    )
    if vp.empty:
        return empty
    dcount = vp.drop_duplicates().groupby(["source", "bg"])["doc_id"].nunique()
    shared = set(dcount[dcount >= 2].index)  # (source, bg) pairs

    def ratio_partial(t: pa.Table) -> pd.DataFrame:
        df = _bigram_frame(t)
        if df.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "n_docs": pd.Series([], dtype=np.int64),
                 "ratio_sum": pd.Series([], dtype=np.float64)}
            )
        key = list(zip(df["source"], df["bg"]))
        df["sh"] = pd.Series(key, index=df.index).isin(shared).astype(np.int64)
        df["n"] = 1
        per = df.groupby(["source", "doc_id"], as_index=False)[["sh", "n"]].sum()
        per["ratio"] = per["sh"].to_numpy(np.float64) / per["n"].to_numpy(
            np.float64
        )
        out = per.groupby("source", as_index=False).agg(
            n_docs=("ratio", "size"), ratio_sum=("ratio", "sum")
        )
        return out.astype({"n_docs": np.int64})

    rp = ds.map_batches(ratio_partial, batch_format="pyarrow").to_pandas()
    if rp.empty:
        return empty
    g = rp.groupby("source")[["n_docs", "ratio_sum"]].sum().sort_index()
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_docs": g["n_docs"].to_numpy(np.int64),
            "self_bleu_micro": np.floor(
                g["ratio_sum"].to_numpy(np.float64)
                / g["n_docs"].to_numpy(np.float64)
                * 1_000_000.0
                + 0.5
            ).astype(np.int64),
        }
    )


ORACLES216["docs_self_bleu"] = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
big AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM w WHERE len(ws) >= 2
),
dc AS (
  SELECT source, bg, count(DISTINCT doc_id) AS nd FROM big GROUP BY 1, 2
),
r AS (
  SELECT big.source, big.doc_id,
         sum(CASE WHEN dc.nd >= 2 THEN 1.0 ELSE 0.0 END) / count(*) AS ratio
  FROM big JOIN dc ON big.source = dc.source AND big.bg = dc.bg
  GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(sum(ratio) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS self_bleu_micro
FROM r GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# docs_distinct_n — Distinct-1 / Distinct-2 diversity per source
# ---------------------------------------------------------------------------


def q_docs_distinct_n(sf_dir: str):
    """Per source: Distinct-1 = distinct unigrams / total unigrams and
    Distinct-2 over bigrams (Li et al. 2016). Output: source, n_tokens,
    n_bigrams, distinct1_micro, distinct2_micro.

    Scale shape: per-batch partial (source, gram) distinct + totals ride
    one bounded-vocabulary fold (corpus-scale vocabularies would swap the
    fold for the wave-193 word-hash bucket exchange)."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object), counts
        )
        uni = pd.DataFrame({"source": src, "g": flat, "k": 1})
        uni = uni[uni["g"] != ""]
        bgf = _bigram_frame(t)
        bg = pd.DataFrame(
            {"source": bgf["source"], "g": bgf["bg"], "k": 2}
        )
        both = pd.concat([uni, bg], ignore_index=True)
        both["n"] = 1
        return both.groupby(["source", "k", "g"], sort=False, as_index=False)[
            "n"
        ].sum().astype({"n": np.int64, "k": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ["source", "n_tokens", "n_bigrams", "distinct1_micro", "distinct2_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    g = part.groupby(["source", "k", "g"])["n"].sum()
    agg = g.groupby(level=[0, 1]).agg(["size", "sum"])
    rows = []
    for src in sorted(agg.index.get_level_values(0).unique()):
        d1 = agg.loc[(src, 1)]
        tot1, dis1 = int(d1["sum"]), int(d1["size"])
        if (src, 2) in agg.index:
            d2 = agg.loc[(src, 2)]
            tot2, dis2 = int(d2["sum"]), int(d2["size"])
        else:
            tot2, dis2 = 0, 0
        rows.append(
            (
                src, np.int64(tot1), np.int64(tot2),
                np.int64(np.floor(dis1 / tot1 * 1_000_000.0 + 0.5)),
                np.int64(
                    np.floor(dis2 / tot2 * 1_000_000.0 + 0.5)
                ) if tot2 else np.int64(0),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES216["docs_distinct_n"] = """
WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
uni AS (
  SELECT source, unnest(ws) AS g FROM w
),
u2 AS (SELECT source, g FROM uni WHERE g <> ''),
big AS (
  SELECT source,
         unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS g
  FROM w WHERE len(ws) >= 2
),
s1 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tot,
         CAST(count(DISTINCT g) AS BIGINT) AS dis
  FROM u2 GROUP BY 1
),
s2 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tot,
         CAST(count(DISTINCT g) AS BIGINT) AS dis
  FROM big GROUP BY 1
)
SELECT s1.source,
       s1.tot AS n_tokens,
       coalesce(s2.tot, 0) AS n_bigrams,
       CAST(floor(CAST(s1.dis AS DOUBLE) / s1.tot * 1000000.0 + 0.5)
            AS BIGINT) AS distinct1_micro,
       CAST(CASE WHEN s2.tot IS NULL THEN 0
                 ELSE floor(CAST(s2.dis AS DOUBLE) / s2.tot * 1000000.0 + 0.5)
            END AS BIGINT) AS distinct2_micro
FROM s1 LEFT JOIN s2 ON s1.source = s2.source
ORDER BY s1.source"""


QUERIES216 = {
    "docs_self_bleu": q_docs_self_bleu,
    "docs_distinct_n": q_docs_distinct_n,
}
