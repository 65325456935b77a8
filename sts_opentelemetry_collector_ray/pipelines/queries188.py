"""Driver-contract queries, wave 188 — KMV (k-minimum-values) distinct
cardinality estimation over word-3-gram shingles per source (estimate vs
exact, Bar-Yossef et al. 2002) and corpus-level RAKE keyword extraction
(Rose et al. 2010: degree/frequency word scores, phrase = stopword-delimited
run). Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES188: dict[str, str] = {}

_KMV_K = 256
_KMV_BUCKETS = 64
_RAKE_BUCKETS = 64
_RAKE_STOPWORDS = ("the", "a")
_FNV64_BASIS = 14695981039346656037
_TWO64 = 18446744073709551616.0


def _fnv64_sql(expr: str) -> str:
    """FNV-1a64 of a VARCHAR expression as HUGEINT (functions/hashing.py
    replay; ASCII text only — codepoint == byte)."""
    return f"""CASE WHEN {expr} = '' THEN CAST({_FNV64_BASIS} AS HUGEINT)
ELSE CAST(list_reduce(list_prepend(CAST({_FNV64_BASIS} AS HUGEINT),
  list_transform(string_split({expr}, ''), c -> unicode(c)::HUGEINT)),
  (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS HUGEINT) END"""


def _flat_tokens(t: pa.Table, col: str):
    """(flat token StringArray, per-row gram-window doc index arrays helper):
    returns (tokens, doc_starts) where doc_starts are int64 offsets."""
    toks = pc.split_pattern(t[col], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
    return flat, offsets


# ---------------------------------------------------------------------------
# docs_kmv_distinct — KMV distinct-shingle estimate vs exact, per source
# ---------------------------------------------------------------------------


def q_docs_kmv_distinct(sf_dir: str):
    """Per source: exact distinct word-3-gram shingle count (by 64-bit
    fingerprint) versus the KMV estimate (K−1)·2⁶⁴/h_K from the K=256
    smallest distinct FNV-1a64 shingle hashes, plus the relative error in
    micro units. Sources with < K distinct shingles fall back to the exact
    count (standard KMV rule).

    Scale shape: shingles leave each batch as (source, hash) — text never
    enters the exchange; ONE hash-bucket exchange makes per-bucket distincts
    global; each bucket ships only a count row and its K smallest hashes, so
    the driver folds buckets × (K+1) rows per source."""
    from ..functions.hashing import fnv1a64_arrow

    path = f"{sf_dir}/documents.parquet"

    def shingle_partial(t: pa.Table) -> pd.DataFrame:
        flat, off = _flat_tokens(t, "text")
        n_docs = len(off) - 1
        starts, ends = off[:-1], off[1:]
        # gram start indices: every flat position i with i+2 < doc end
        counts = np.maximum(ends - starts - 2, 0)
        if counts.sum() == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "hv": pd.Series([], dtype=np.uint64),
                 "_b": pd.Series([], dtype=np.int32)}
            )
        base = np.repeat(starts, counts)
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(first, counts)
        i0 = base + within
        t0 = flat.take(pa.array(i0))
        t1 = flat.take(pa.array(i0 + 1))
        t2 = flat.take(pa.array(i0 + 2))
        grams = pc.binary_join_element_wise(t0, t1, t2, " ")
        hv = fnv1a64_arrow(grams)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object),
            counts[:n_docs],
        )
        df = pd.DataFrame({"source": src, "hv": hv}).drop_duplicates()
        df["_b"] = (df["hv"].to_numpy() % np.uint64(_KMV_BUCKETS)).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["source", "hv"])
        outs = []
        for src, sub in d.groupby("source", sort=False):
            hv = np.sort(sub["hv"].to_numpy(np.uint64))
            outs.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "kind": ["c"] + ["k"] * min(len(hv), _KMV_K),
                        "hv": np.concatenate([[np.uint64(0)], hv[:_KMV_K]]),
                        "n": [np.int64(len(hv))] + [0] * min(len(hv), _KMV_K),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "kind": pd.Series([], dtype=object),
                 "hv": pd.Series([], dtype=np.uint64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True).astype(
            {"hv": np.uint64, "n": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(shingle_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "n_exact": pd.Series([], dtype=np.int64),
            "est": pd.Series([], dtype=np.int64),
            "err_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    counts = (
        part[part["kind"] == "c"].groupby("source")["n"].sum().sort_index()
    )
    rows = []
    kpart = part[part["kind"] == "k"]
    for src, n_exact in counts.items():
        hv = np.sort(kpart[kpart["source"] == src]["hv"].to_numpy(np.uint64))
        if len(hv) >= _KMV_K:
            hk = float(hv[_KMV_K - 1])
            est = int(np.floor((_KMV_K - 1) * _TWO64 / hk))
        else:
            est = int(n_exact)
        err = int(
            np.floor(abs(est - int(n_exact)) / float(n_exact) * 1_000_000.0 + 0.5)
        )
        rows.append((src, int(n_exact), est, err))
    return pd.DataFrame(
        rows, columns=["source", "n_exact", "est", "err_micro"]
    ).astype({"n_exact": np.int64, "est": np.int64, "err_micro": np.int64})


ORACLES188["docs_kmv_distinct"] = f"""
WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT source,
         unnest(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM w WHERE len(ws) >= 3
),
d0 AS (SELECT DISTINCT source, sh FROM g),
d AS (SELECT DISTINCT source, {_fnv64_sql('sh')} AS hv FROM d0),
cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM d GROUP BY 1),
kth AS (
  SELECT source, hv FROM (
    SELECT source, hv,
           row_number() OVER (PARTITION BY source ORDER BY hv) AS r
    FROM d
  ) WHERE r = {_KMV_K}
),
e AS (
  SELECT cnt.source, cnt.n_exact,
         CASE WHEN kth.hv IS NULL THEN cnt.n_exact
              ELSE CAST(floor({_KMV_K - 1}.0 * 18446744073709551616.0
                              / CAST(kth.hv AS DOUBLE)) AS BIGINT) END AS est
  FROM cnt LEFT JOIN kth ON cnt.source = kth.source
)
SELECT source, n_exact, est,
       CAST(floor(abs(CAST(est - n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS err_micro
FROM e ORDER BY source"""


# ---------------------------------------------------------------------------
# docs_rake_keywords — corpus-level RAKE phrase extraction
# ---------------------------------------------------------------------------


def q_docs_rake_keywords(sf_dir: str):
    """Top-20 RAKE keyphrases over the corpus: candidate phrases are maximal
    stopword-free runs ('the'/'a' delimit); word score = degree/frequency
    with corpus-level stats (degree(w) = Σ phrase length over occurrences);
    phrase score = Σ word scores (with multiplicity). Output: phrase,
    occurrence count, score_micro — ORDER BY score_micro DESC, phrase ASC.

    Scale shape: pass 1 folds bounded-vocabulary (word, freq, degree)
    partials on the driver and broadcasts the score table; pass 2 ships
    (phrase, n) combiner partials through ONE phrase-hash bucket exchange
    with per-bucket exact sums, vectorized explode+searchsorted scoring and
    local top-k. Driver residue: buckets × 20 rows."""
    from ..functions.hashing import fnv1a64_array

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["text"])

    def segments(t: pa.Table):
        """flat kept-token array + segment ids (phrase instances)."""
        flat, off = _flat_tokens(t, "text")
        words = np.asarray(flat.to_numpy(zero_copy_only=False), object)
        n = len(words)
        if n == 0:
            return words[:0], np.array([], np.int64)
        newdoc = np.zeros(n, dtype=bool)
        newdoc[off[:-1][off[:-1] < n]] = True
        stop = np.isin(words, _RAKE_STOPWORDS)
        boundary = stop | newdoc
        seg = np.cumsum(boundary)
        keep = ~stop & (words != "")
        return words[keep], seg[keep]

    def word_stats_partial(t: pa.Table) -> pd.DataFrame:
        kw, seg = segments(t)
        if len(kw) == 0:
            return pd.DataFrame(
                {"w": pd.Series([], dtype=object),
                 "freq": pd.Series([], dtype=np.int64),
                 "deg": pd.Series([], dtype=np.int64)}
            )
        plen = np.bincount(seg)  # phrase length per segment id
        deg = plen[seg]
        return (
            pd.DataFrame({"w": kw, "freq": 1, "deg": deg})
            .groupby("w", sort=False, as_index=False)
            .sum()
            .astype({"freq": np.int64, "deg": np.int64})
        )

    wsp = ds.map_batches(word_stats_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "phrase": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "score_micro": pd.Series([], dtype=np.int64),
        }
    )
    if wsp.empty:
        return empty
    wstat = wsp.groupby("w").sum().sort_index()
    w_keys = np.asarray(wstat.index.to_numpy(object))
    w_score = wstat["deg"].to_numpy(np.float64) / wstat["freq"].to_numpy(np.float64)

    def phrase_partial(t: pa.Table) -> pd.DataFrame:
        kw, seg = segments(t)
        if len(kw) == 0:
            return pd.DataFrame(
                {"phrase": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_b": pd.Series([], dtype=np.int32)}
            )
        phr = (
            pd.DataFrame({"w": kw, "seg": seg})
            .groupby("seg", sort=True)["w"]
            .agg(" ".join)
        )
        out = (
            pd.DataFrame({"phrase": phr.to_numpy(object)})
            .groupby("phrase", sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["_b"] = (
            fnv1a64_array(out["phrase"].to_numpy(object))
            % np.uint64(_RAKE_BUCKETS)
        ).astype(np.int32)
        return out.astype({"n": np.int64})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("phrase", as_index=False)["n"].sum()
        ph = pa.array(agg["phrase"].to_numpy(object), pa.string())
        toks = pc.split_pattern(ph, " ")
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        sc = w_score[np.searchsorted(w_keys, flat)]
        score = np.add.reduceat(sc, off[:-1]) if len(flat) else np.array([])
        # reduceat repeats the value at equal consecutive offsets (empty
        # phrase) — phrases are non-empty by construction, no correction
        agg["score_micro"] = np.floor(score * 1_000_000.0 + 0.5).astype(np.int64)
        return agg.sort_values(
            ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
        ).head(20).astype({"n": np.int64})

    part = (
        ds.map_batches(phrase_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    if part.empty:
        return empty
    out = part.sort_values(
        ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
    ).head(20)
    return out[["phrase", "n", "score_micro"]].reset_index(drop=True).astype(
        {"n": np.int64, "score_micro": np.int64}
    )


_STOP_SQL = "('" + "', '".join(_RAKE_STOPWORDS) + "')"

ORACLES188["docs_rake_keywords"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, unnest(ws) AS w,
         unnest(range(1, len(ws) + 1)) AS pos
  FROM w
),
t2 AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN {_STOP_SQL} THEN 1 ELSE 0 END AS stop
  FROM tok WHERE w <> ''
),
seg AS (
  SELECT doc_id, pos, w, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM t2
),
pw AS (SELECT doc_id, sid, pos, w FROM seg WHERE stop = 0),
phr AS (
  SELECT doc_id, sid, string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM pw GROUP BY 1, 2
),
wstat AS (
  SELECT pw.w, count(*) AS freq, sum(phr.plen) AS deg
  FROM pw JOIN phr ON pw.doc_id = phr.doc_id AND pw.sid = phr.sid
  GROUP BY 1
),
score AS (SELECT w, CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS s FROM wstat),
dp AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n FROM phr GROUP BY 1),
spl AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dp),
psc AS (
  SELECT spl.phrase, sum(score.s) AS sc
  FROM spl JOIN score ON spl.w = score.w GROUP BY 1
)
SELECT dp.phrase, dp.n,
       CAST(floor(psc.sc * 1000000.0 + 0.5) AS BIGINT) AS score_micro
FROM dp JOIN psc ON dp.phrase = psc.phrase
ORDER BY score_micro DESC, dp.phrase ASC LIMIT 20"""


QUERIES188 = {
    "docs_kmv_distinct": q_docs_kmv_distinct,
    "docs_rake_keywords": q_docs_rake_keywords,
}
